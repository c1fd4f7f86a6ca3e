"""r19 optimization round: per-fragment timing attribution for the
heavy headline queries (guide §1 — find where the time actually goes
before changing anything).

Each fragment is a sub-DataFrame of a heavy query's plan, forced with
the noop sink after one untimed warmup; median of 3. Fragments nest
(e.g. `minhash_sigs` includes `shingle_rows`), so read deltas between
rows, not absolute shares.

    python tools/profile_fragments_r19.py [fragment ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    from pyspark.sql import functions as F

    from thrivefinancedatapipeline_spark.session import get_spark
    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators import dedup as D
    from thrivefinancedatapipeline_spark.operators import similarity as S
    from thrivefinancedatapipeline_spark.functions.text import (
        md5_long, tokens,
    )

    spark = get_spark("profile-fragments")

    def docs():
        return load_table(spark, SF_DIR, "documents")

    def frag_docs_scan():
        return docs().select("doc_id", F.length("text").alias("n"))

    def frag_tokens():
        return docs().select("doc_id", tokens(F.col("text")).alias("t")) \
                     .select("doc_id", F.size("t").alias("n"))

    def frag_shingle_rows():
        return D._shingle_rows(docs())

    def frag_shingle_md5():
        sh = D._shingle_rows(docs())
        return sh.select("doc_id", (md5_long(F.col("sh")) % D.P).alias("h"))

    def frag_minhash_sigs():
        return D._minhash_signatures(D._shingle_rows(docs()))

    def frag_minhash_cand():
        sh = D._shingle_rows(docs()).localCheckpoint(eager=True)
        bands = D._minhash_bands(D._minhash_signatures(sh))
        b1 = bands.select(F.col("doc_id").alias("doc_id_1"), "band", "key")
        b2 = bands.select(F.col("doc_id").alias("doc_id_2"), "band", "key")
        return (
            b1.join(b2, ["band", "key"])
            .filter(F.col("doc_id_1") < F.col("doc_id_2"))
            .select("doc_id_1", "doc_id_2")
            .distinct()
        )

    def frag_minhash_arrs():
        sh = D._shingle_rows(docs()).localCheckpoint(eager=True)
        return sh.groupBy("doc_id").agg(
            F.collect_list("sh").alias("shs"), F.count("*").alias("c")
        )

    def frag_minhash_full():
        return D.q_dedup_minhash_lsh(spark, SF_DIR)

    def frag_token_hashes():
        toks = F.array_distinct(tokens(F.col("text")))
        hs = F.transform(toks, md5_long)
        return docs().select("doc_id", F.size(hs).alias("n"))

    def frag_simhash_full():
        return D._simhash_df(docs())

    def frag_simhash_counts_only():
        toks = F.array_distinct(tokens(F.col("text")))
        hs = F.transform(toks, md5_long)
        cnt = F.expr(
            f"aggregate(hs, array_repeat(0, {D.SIMHASH_BITS}), (acc, h) -> "
            f"zip_with(acc, transform(sequence(0, {D.SIMHASH_BITS - 1}), "
            f"i -> CAST((h >> i) & 1 AS INT)), (a, b) -> a + b))"
        )
        return docs().select("doc_id", hs.alias("hs")) \
                     .select("doc_id", F.size(cnt).alias("n"))

    def iv():
        return S._int_vecs(spark, SF_DIR)

    def frag_emb_scan():
        return iv().select("vec_id", F.size("xi").alias("n"))

    def frag_ivf_assign():
        cents = S._trained_centroids_cached(spark, SF_DIR, iv())
        structs = S._cell_structs(cents)
        return iv().select(
            "vec_id", F.array_min(structs).getField("cell").alias("cell")
        )

    def frag_ivfpq_encode():
        cents = S._trained_centroids_cached(spark, SF_DIR, iv())
        books = S._ivfpq_books_cached(SF_DIR, iv(), cents)
        return S._ivfpq_encode(iv(), cents, books)

    def frag_ivfpq_pool():
        cents = S._trained_centroids_cached(spark, SF_DIR, iv())
        books = S._ivfpq_books_cached(SF_DIR, iv(), cents)
        codes = S._ivfpq_encode(iv(), cents, books)
        probes = S._ivfpq_probes(iv(), cents, books)
        from pyspark.sql import Window
        adc = F.expr(
            "aggregate(codes, 0L, (acc, i) -> acc + element_at(lut, i))"
        )
        wp = Window.partitionBy("query_id").orderBy(
            F.col("adc_d2").asc(), F.col("neighbor_id")
        )
        return (
            F.broadcast(probes)
            .join(codes, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("adc_d2", adc)
            .withColumn("prank", F.row_number().over(wp))
            .filter(F.col("prank") <= S.PQ_CANDIDATES)
            .select("query_id", "neighbor_id")
        )

    def frag_ivfpq_full():
        return S.ivfpq_knn(spark, SF_DIR)

    def frag_ivf_full():
        return S.q_ivf_knn(spark, SF_DIR)

    fragments = {
        "docs_scan": frag_docs_scan,
        "tokens": frag_tokens,
        "shingle_rows": frag_shingle_rows,
        "shingle_md5": frag_shingle_md5,
        "minhash_sigs": frag_minhash_sigs,
        "minhash_cand": frag_minhash_cand,
        "minhash_arrs": frag_minhash_arrs,
        "minhash_full": frag_minhash_full,
        "token_hashes": frag_token_hashes,
        "simhash_counts_only": frag_simhash_counts_only,
        "simhash_full": frag_simhash_full,
        "emb_scan": frag_emb_scan,
        "ivf_assign": frag_ivf_assign,
        "ivfpq_encode": frag_ivfpq_encode,
        "ivfpq_pool": frag_ivfpq_pool,
        "ivf_full": frag_ivf_full,
        "ivfpq_full": frag_ivfpq_full,
    }
    names = sys.argv[1:] or list(fragments)
    unknown = [n for n in names if n not in fragments]
    if unknown:
        raise SystemExit(f"unknown fragments: {unknown}")
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"frag:{name}")
        force(fragments[name]())  # warmup (codegen)
        spark.catalog.clearCache()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(fragments[name]())
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        runs.sort()
        out[name] = round(runs[1], 3)
        print(name, out[name], [round(r, 3) for r in runs], flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
