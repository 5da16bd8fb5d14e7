"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

``queries()`` maps one entry per implemented operator family from
SURVEY.md §2 (+ the engine's training-data additions) to callables over an
``sf_dir``; ``oracle_sql()`` holds the DuckDB-equivalent SQL where the
operator is SQL-expressible (non-SQL ops — LSH dedup, simhash, lang-id,
docmatch, IVF ANN, media featurization — get rows-only checks).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np

SF001 = "/root/testdata/sf0.001"


def _registry_from_customer(sf_dir):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    )

    def to_y(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ykey": t["c_custkey"],
                "name": t["c_name"],
                "segment": t["c_mktsegment"],
                "registry_id": pc.binary_join_element_wise(
                    "R-", pc.cast(t["c_custkey"], pa.string()), ""
                ),
            }
        )

    return cust.map_batches(to_y, batch_format="pyarrow")


def _match_exact_customer(sf_dir: str):
    """O7/O8 end-to-end: customers matched against a derived registry,
    blocked on mktsegment, exact scorer on name, copy-over of registry_id.
    Names are unique ⇒ every row MATCHED at 100 with its own key."""
    import ray.data

    from record_matcher_ray.core.config import MatchConfigBuilder
    from record_matcher_ray.pipelines.match import match_datasets

    x = ray.data.read_parquet(f"{sf_dir}/customer.parquet")
    y = _registry_from_customer(sf_dir)
    b = MatchConfigBuilder(
        x_columns={"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
        y_columns={"ykey", "name", "segment", "registry_id"},
    )
    b.match("c_name", ["name"], scorer="exact_match")
    b.group("segment", "c_mktsegment")
    b.get("registry_id", "matched_registry_id")
    cfg = b.build()
    return match_datasets(x, y, cfg, "c_custkey", "ykey").dataset


def entry() -> Any:
    """Flagship pipeline smoke: the blocked exact match on sf0.001."""
    return _match_exact_customer(SF001)


# ---------------------------------------------------------------------------


def _q_uniqueness_customer(sf_dir: str):
    import pandas as pd
    import ray.data

    from record_matcher_ray.pipelines import table_ops

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_name", "c_mktsegment", "c_nationkey"],
    )
    u = table_ops.uniqueness(ds, ["c_name", "c_mktsegment", "c_nationkey"])
    return pd.DataFrame(
        sorted(u.items()), columns=["col", "uniqueness"]
    )


def _q_group_by_segment(sf_dir: str):
    import ray.data

    from record_matcher_ray.pipelines import table_ops

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet")
    return table_ops.group_by(ds, {"c_mktsegment": "BUILDING"})


def _q_duplicated_orders(sf_dir: str):
    import ray.data

    from record_matcher_ray.pipelines import table_ops

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet")
    return table_ops.duplicated_by_column(ds, "o_custkey")


def _q_dedup_exact_docs(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Count, Min

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = (
        ds.groupby("text")
        .aggregate(Min("doc_id", alias_name="keeper_id"),
                   Count(alias_name="n_copies"))
        .to_pandas()
    )
    out["keeper_id"] = out["keeper_id"].astype("int64")
    out["n_copies"] = out["n_copies"].astype("int64")
    return out


def _q_latest_order(sf_dir: str):
    """CDC / upsert compaction: each customer's latest order (max
    o_orderdate, ties broken by max o_orderkey)."""
    import ray.data

    from record_matcher_ray.pipelines.table_ops import latest_by_key

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet")
    return latest_by_key(
        ds, "o_custkey", "o_orderdate", tie_col="o_orderkey"
    )


def _q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq

    import ray.data

    from record_matcher_ray.pipelines.similarity import brute_force_topk

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    head = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).slice(0, 5)
    q = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"].to_pylist()])
    out = brute_force_topk(
        ds, q, k=10, query_ids=head["vec_id"].to_numpy()
    )
    out = out[["query_id", "vec_id", "cos_sim"]].copy()
    out["cos_sim"] = out["cos_sim"].round(4)
    return out


def _q_lsh_topk(sf_dir: str):
    """Random-hyperplane LSH ANN: same 5 queries as ann_topk, but only
    bucket-colliding candidates are scored (the LSH-bucketed scale path)."""
    import pyarrow.parquet as pq

    import ray.data

    from record_matcher_ray.pipelines.similarity import lsh_topk

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    head = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).slice(0, 5)
    q = np.stack(
        [np.asarray(v, dtype=np.float64) for v in head["embedding"].to_pylist()]
    )
    out = lsh_topk(
        ds, q, k=10, n_tables=4, n_bits=6, seed=0,
        query_ids=head["vec_id"].to_numpy(),
    )
    out = out[["query_id", "vec_id", "cos_sim"]].copy()
    out["cos_sim"] = out["cos_sim"].round(4)
    return out


def _lsh_topk_oracle() -> str:
    """Bit-exact DuckDB replay of the LSH bucketing: the engine's sign
    matrix is embedded as literals, components quantized by the same
    floor(x * 2^20) (exact in float64 both sides), dots summed as exact
    integers (list_sum → HUGEINT), candidates = any-table code equality,
    then the ann_topk cosine-rank recipe."""
    from record_matcher_ray.pipelines.similarity import lsh_sign_matrix

    n_tables, n_bits, dim, seed, k = 4, 6, 64, 0, 10
    signs = lsh_sign_matrix(dim, n_tables, n_bits, seed)

    def code_expr(t: int) -> str:
        terms = []
        for i in range(n_bits):
            lit = "[" + ",".join(str(int(s)) for s in signs[t, i]) + "]"
            dot = (
                f"list_sum(list_transform(list_zip(qv, {lit}), "
                f"z -> z[1] * z[2]))"
            )
            terms.append(f"CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END")
        return "(" + " + ".join(terms) + ")"

    codes = ",\n                 ".join(
        f"{code_expr(t)} AS c{t}" for t in range(n_tables)
    )
    onexpr = " OR ".join(f"q.c{t} = v.c{t}" for t in range(n_tables))
    return f"""
        WITH qz AS (
          SELECT vec_id, embedding,
                 list_transform(embedding::DOUBLE[],
                                x -> CAST(floor(x * 1048576.0) AS BIGINT))
                   AS qv
          FROM embeddings
        ), codes AS (
          SELECT vec_id, embedding,
                 {codes}
          FROM qz
        ), cand AS (
          SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                 list_cosine_similarity(q.embedding::DOUBLE[],
                                        v.embedding::DOUBLE[]) AS sim
          FROM codes q JOIN codes v ON ({onexpr})
          WHERE q.vec_id < 5
        ), ranked AS (
          SELECT query_id, vec_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, vec_id) AS rnk
          FROM cand
        )
        SELECT query_id, vec_id, round(sim, 4) AS cos_sim
        FROM ranked WHERE rnk <= {k}
    """


def _q_docmatch(sf_dir: str):
    """North-star pipeline over a deterministic interleaved corpus sized by
    sf (rows-only check: blocking + scoring + clustering are not SQL)."""
    import ray.data

    from record_matcher_ray.pipelines.docmatch import match_documents
    from record_matcher_ray.sources.corpus import generate_corpus

    scale = {"0.001": 60, "0.01": 200, "0.1": 800}.get(
        sf_dir.rstrip("/").split("sf")[-1], 200
    )
    d = f"/tmp/rmr_corpus_{scale}"
    if not os.path.exists(f"{d}/truth.parquet"):
        generate_corpus(d, n_entities=scale, seed=42)
    res = match_documents(
        ray.data.read_parquet(f"{d}/corpus.parquet"),
        ray.data.read_parquet(f"{d}/registry.parquet"),
    )
    return res.assignments


def _q_minhash_dedup(sf_dir: str):
    import ray.data

    from record_matcher_ray.pipelines.dedup import minhash_dedup

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return minhash_dedup(ds, "text", "doc_id", jaccard_threshold=60.0)["pairs"]


def _q_simhash(sf_dir: str):
    import ray.data

    from record_matcher_ray.pipelines.dedup import simhash64

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return simhash64(ds, "text", "doc_id")


def _q_lang_id(sf_dir: str):
    import ray.data

    from record_matcher_ray.pipelines.analysis import language_id

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return language_id(ds)


def _q_fingerprints(sf_dir: str):
    import ray.data

    from record_matcher_ray.pipelines.analysis import fingerprints

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return fingerprints(ds)


def _q_minhash_recall(sf_dir: str):
    """LSH pair recall vs brute-force shingle-Jaccard ground truth on a
    150-doc slice. One row: (n_true_pairs, n_verified_pairs,
    verified_recall, false_positives) at jaccard >= 60. Both sides are
    deterministic (fixed MinHasher seed), so the WHOLE metric is
    hash-checked by the SQL oracle (_minhash_recall_oracle: truth via a
    shingle self-join, verified via the LSH replay). The slice is capped
    because the TRUTH side is O(n²) pairs × shingle-set size on the
    driver — it validates recall, it is not the scale path."""
    import pandas as pd
    import ray.data

    from record_matcher_ray.pipelines.dedup import minhash_dedup
    from record_matcher_ray.stages.blocking import char_shingles, normalize_text

    docs = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .sort("doc_id")
        .limit(150)
        .materialize()
    )
    df = docs.to_pandas()
    sets = [
        char_shingles(normalize_text(t or ""), 4) for t in df["text"].tolist()
    ]
    ids = df["doc_id"].to_numpy()
    n = len(ids)
    # all-pairs exact Jaccard via ONE doc×shingle 0/1 matmul (no per-pair
    # set expansion): inter = M @ M.T, union = |a|+|b|-inter.
    lens = np.array([len(s) for s in sets], np.int64)
    flat = (np.concatenate(sets) if lens.sum() else np.empty(0, np.int64))
    cols = pd.factorize(flat)[0]
    m = np.zeros((n, int(cols.max()) + 1 if len(cols) else 1), np.float32)
    m[np.repeat(np.arange(n), lens), cols] = 1.0
    inter = m @ m.T
    union = lens[:, None] + lens[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        sims = np.where(union > 0, 100.0 * inter / union, 0.0)
    sims = np.round(sims, 6)
    ai, bi = np.triu_indices(n, k=1)
    tmask = (sims[ai, bi] >= 60.0) & (lens[ai] > 0) & (lens[bi] > 0)
    truth = {
        (int(min(ids[x], ids[y])), int(max(ids[x], ids[y])))
        for x, y in zip(ai[tmask], bi[tmask])
    }
    res = minhash_dedup(docs, "text", "doc_id", jaccard_threshold=60.0)
    ver = res["pairs"].to_pandas()
    verified = {(int(a), int(b)) for a, b in zip(ver["a"], ver["b"])}
    return pd.DataFrame(
        [
            {
                "n_true_pairs": len(truth),
                "n_verified_pairs": len(verified),
                "verified_recall": round(
                    len(verified & truth) / max(1, len(truth)), 6
                ),
                "false_positives": len(verified - truth),
            }
        ]
    )


def _q_simhash_near_dups(sf_dir: str):
    """Banded Hamming LSH over simhash64 fingerprints (rows-only: simhash
    r3: banding has 100% recall (pigeonhole), so the full pair set IS
    deterministic — oracled by a brute-force bit_count self-join in SQL
    (`_hash_oracles`); semantics additionally pinned vs brute-force
    Hamming in tests/test_operators.py::test_simhash_near_dups_vs_brute."""
    import ray.data

    from record_matcher_ray.pipelines.dedup import simhash_near_dups

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return simhash_near_dups(ds, "text", "doc_id", max_hamming=3)


def _q_ngram_jaccard(sf_dir: str):
    """EXACT n-gram-Jaccard near-dup pairs (no LSH) — SQL-expressible via
    an inverted-index self-join, so this one carries a full hash oracle
    (unlike seed-dependent minhash_dedup_docs)."""
    import ray.data

    from record_matcher_ray.pipelines.dedup import ngram_jaccard_dedup

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = ngram_jaccard_dedup(
        ds, "text", "doc_id", jaccard_threshold=60.0
    ).to_pandas()
    out["jaccard"] = out["jaccard"].round(6)
    return out


def _q_decontam_near(sf_dir: str):
    """Near-dup decontamination: eval side = every 7th document truncated
    to its first 80% of characters (planted light-edit contamination);
    broadcast eval inverted index, one zero-shuffle pass over train."""
    import pyarrow as pa
    import ray.data

    from record_matcher_ray.pipelines.dedup import ngram_jaccard_decontam

    train = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def derive(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sel = t.filter(pa.array((ids % 7) == 0))
        cut = [
            (s or "")[: max(1, (len(s or "") * 4) // 5)]
            for s in sel["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": sel["doc_id"], "text": pa.array(cut, pa.string())}
        )

    ev = train.map_batches(derive, batch_format="pyarrow")
    out = ngram_jaccard_decontam(
        train, ev, "text", "doc_id", jaccard_threshold=60.0
    ).to_pandas()
    out["jaccard"] = out["jaccard"].round(6)
    return out


def _q_bm25_topk(sf_dir: str):
    """Ranked retrieval: top-10 docs by BM25 for the fixed query, ties by
    doc_id ascending (deterministic cut)."""
    import ray.data

    from record_matcher_ray.pipelines.terms import bm25_topk

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return bm25_topk(ds, "merge scan vector window", k=10)


def _q_compression(sf_dir: str):
    """Per-doc zlib compression ratio (classic cheap repetition/quality
    signal); no DuckDB zlib ⇒ rows-only, pinned vs direct zlib in tests."""
    import ray.data

    from record_matcher_ray.pipelines.analysis import compression_metrics

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return compression_metrics(ds)


def _q_containment(sf_dir: str):
    """Leaked-benchmark decontamination: eval side = a verbatim middle
    slice of every 11th document (embedded contamination Jaccard misses);
    eval-side gram containment over the broadcast inverted index."""
    import pyarrow as pa
    import ray.data

    from record_matcher_ray.pipelines.dedup import ngram_jaccard_decontam

    train = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def derive(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sel = t.filter(pa.array((ids % 11) == 0))
        cut = [
            (s or "")[len(s or "") // 3: len(s or "") // 3
                      + max(3 * len(s or "") // 10, 4)]
            for s in sel["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": sel["doc_id"], "text": pa.array(cut, pa.string())}
        )

    ev = train.map_batches(derive, batch_format="pyarrow")
    out = ngram_jaccard_decontam(
        train, ev, "text", "doc_id",
        jaccard_threshold=90.0, metric="containment",
    ).to_pandas()
    out["containment"] = out["containment"].round(6)
    return out


def _q_minhash_decontam(sf_dir: str):
    """LSH-path decontamination (big-eval escape hatch): same planted
    truncation fixture as decontam_near_docs. Fully deterministic (fixed
    MinHasher seed), so the whole tagged-union LSH pipeline is replayed
    by the SQL oracle (_minhash_decontam_oracle), hash-exact; recall vs
    the exact path is additionally pinned in tests."""
    import pyarrow as pa
    import ray.data

    from record_matcher_ray.pipelines.dedup import minhash_decontam

    train = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def derive(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sel = t.filter(pa.array((ids % 7) == 0))
        cut = [
            (s or "")[: max(1, (len(s or "") * 4) // 5)]
            for s in sel["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": sel["doc_id"], "text": pa.array(cut, pa.string())}
        )

    ev = train.map_batches(derive, batch_format="pyarrow")
    return minhash_decontam(
        train, ev, "text", "doc_id", jaccard_threshold=60.0
    )


def _q_embedding_near_dups(sf_dir: str):
    """Exact broadcast variant (full recall ⇒ SQL-hash comparable); the
    IVF multi-probe variant is the >1 M-row scale path, recall-tested in
    tests/test_operators.py. Threshold 0.35 because the synthetic
    embeddings have no true near-dups (max pairwise cos ≈ 0.51)."""
    import ray.data

    from record_matcher_ray.pipelines.similarity import embedding_near_dups_exact

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dups_exact(ds, threshold=0.35)


def _q_decontam(sf_dir: str):
    """Train/eval overlap check: every 20th doc plays the 'eval set'; each
    corpus doc reports the fraction of its 16-char normalized windows that
    appear anywhere in the eval set. Exact mode (sorted-hash broadcast) so
    the DuckDB string-window oracle matches hash-exactly; bloom mode is
    the fixed-memory 100-TB path (FP-bound tested in tests)."""
    import ray.data
    import pyarrow as pa

    from record_matcher_ray.pipelines.decontam import contamination

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def every20(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return t.filter(pa.array(ids % 20 == 0))

    ref = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(every20, batch_format="pyarrow")
    return contamination(ds, ref, "text", "doc_id", window=16, mode="exact")


def _q_pii(sf_dir: str):
    """Per-doc PII detector counts (email/phone/ipv4/ssn) — RE2 kernels,
    zero shuffle; DuckDB runs the identical RE2 patterns."""
    import ray.data

    from record_matcher_ray.pipelines.pii import pii_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return pii_counts(ds)


_PR_OFF = 1_000_000  # supplier node-id offset in the bipartite graph


def _q_pagerank(sf_dir: str):
    """Fixed-point integer PageRank (4 iterations, d=0.85) over the
    bidirectional part↔supplier graph of lineitem — the engine's second
    iterative distributed algorithm, bit-replayed by chained CTEs like
    kmeans."""
    import pyarrow as pa

    import ray.data

    from record_matcher_ray.pipelines.graph import pagerank

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def edges(t: pa.Table) -> pa.Table:
        p = t["l_partkey"].to_numpy().astype(np.int64)
        s = t["l_suppkey"].to_numpy().astype(np.int64) + _PR_OFF
        return pa.table(
            {"src": pa.array(np.concatenate([p, s])),
             "dst": pa.array(np.concatenate([s, p]))}
        )

    return pagerank(li.map_batches(edges, batch_format="pyarrow"), iters=4)


def _q_ppr(sf_dir: str):
    """Personalized PageRank (random walk with restart): 4 iterations,
    restart at parts whose partkey % 97 == 0, over the bidirectional
    part<->supplier graph."""
    import pyarrow as pa

    import ray.data

    from record_matcher_ray.pipelines.graph import pagerank

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def edges(t: pa.Table) -> pa.Table:
        p = t["l_partkey"].to_numpy().astype(np.int64)
        s = t["l_suppkey"].to_numpy().astype(np.int64) + _PR_OFF
        return pa.table(
            {"src": pa.array(np.concatenate([p, s])),
             "dst": pa.array(np.concatenate([s, p]))}
        )

    pk = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"]
    ).to_pandas()["p_partkey"].to_numpy(dtype=np.int64)
    seeds = pk[pk % 97 == 0]
    return pagerank(li.map_batches(edges, batch_format="pyarrow"),
                    iters=4, seeds=seeds)


def _ppr_oracle(iters: int = 4, total_bits: int = 40,
                d_num: int = 85, d_den: int = 100) -> str:
    """Bit-exact replay of pipelines/graph.pagerank with seeds: teleport
    mass only at seed nodes (partkey % 97 == 0), init 2^bits // |seeds|;
    all arithmetic non-negative HUGEINT so `//` equals Python floor."""
    total = 1 << total_bits
    tele = (f"(({d_den - d_num} * (SELECT init FROM consts)) "
            f"// {d_den})")
    sql = [f"""
        WITH edges AS (
          SELECT l_partkey::BIGINT AS src,
                 l_suppkey::BIGINT + {_PR_OFF} AS dst
          FROM lineitem
          UNION ALL
          SELECT l_suppkey::BIGINT + {_PR_OFF} AS src,
                 l_partkey::BIGINT AS dst
          FROM lineitem
        ), deg AS (
          SELECT src AS node, count(*)::HUGEINT AS outd
          FROM edges GROUP BY src
        ), nodes AS (
          SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION ALL SELECT dst FROM edges)
        ), seeds AS (
          SELECT node FROM nodes
          WHERE node < {_PR_OFF} AND node % 97 = 0
        ), consts AS (
          SELECT ({total}::HUGEINT
                  // (SELECT count(*) FROM seeds)) AS init
        ), pr0 AS (
          SELECT nd.node,
                 CASE WHEN s.node IS NOT NULL
                      THEN (SELECT init FROM consts)
                      ELSE 0::HUGEINT END AS pr
          FROM nodes nd LEFT JOIN seeds s ON s.node = nd.node
        )"""]
    for i in range(1, iters + 1):
        sql.append(f""",
        pr{i} AS (
          SELECT nd.node,
                 CASE WHEN sd.node IS NOT NULL THEN {tele}
                      ELSE 0::HUGEINT END
                 + ({d_num} * coalesce(f.s, 0)) // {d_den} AS pr
          FROM nodes nd
          LEFT JOIN seeds sd ON sd.node = nd.node
          LEFT JOIN (
            SELECT e.dst AS node, sum(p.pr // g.outd) AS s
            FROM edges e
            JOIN pr{i - 1} p ON p.node = e.src
            JOIN deg g ON g.node = e.src
            GROUP BY e.dst
          ) f ON f.node = nd.node
        )""")
    sql.append(f"""
        SELECT node, pr::BIGINT AS pr FROM pr{iters}
    """)
    return "".join(sql)


def _pagerank_oracle(iters: int = 4, total_bits: int = 40,
                     d_num: int = 85, d_den: int = 100) -> str:
    """Bit-exact replay of pipelines/graph.pagerank: every iteration is a
    chained CTE; all arithmetic is non-negative HUGEINT so DuckDB's `//`
    truncation equals Python's floor."""
    total = 1 << total_bits
    tele = f"(({d_den - d_num} * (SELECT init FROM consts)) // {d_den})"
    sql = [f"""
        WITH edges AS (
          SELECT l_partkey::BIGINT AS src,
                 l_suppkey::BIGINT + {_PR_OFF} AS dst
          FROM lineitem
          UNION ALL
          SELECT l_suppkey::BIGINT + {_PR_OFF} AS src,
                 l_partkey::BIGINT AS dst
          FROM lineitem
        ), deg AS (
          SELECT src AS node, count(*)::HUGEINT AS outd
          FROM edges GROUP BY src
        ), nodes AS (
          SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION ALL SELECT dst FROM edges)
        ), consts AS (
          SELECT count(*)::HUGEINT AS n,
                 ({total}::HUGEINT // count(*)) AS init
          FROM nodes
        ), pr0 AS (
          SELECT node, (SELECT init FROM consts) AS pr FROM nodes
        )"""]
    for i in range(1, iters + 1):
        sql.append(f""",
        pr{i} AS (
          SELECT nd.node,
                 {tele} + ({d_num} * coalesce(f.s, 0)) // {d_den} AS pr
          FROM nodes nd LEFT JOIN (
            SELECT e.dst AS node, sum(p.pr // g.outd) AS s
            FROM edges e
            JOIN pr{i - 1} p ON p.node = e.src
            JOIN deg g ON g.node = e.src
            GROUP BY e.dst
          ) f ON f.node = nd.node
        )""")
    sql.append(f"""
        SELECT node, pr::BIGINT AS pr FROM pr{iters}
    """)
    return "".join(sql)


def _q_linear_fit(sf_dir: str):
    """Distributed OLS: lineitem extendedprice vs quantity — one-pass
    integer-moment partials, closed form on the driver."""
    import ray.data

    from record_matcher_ray.pipelines.stats import linear_fit

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"],
    )
    return linear_fit(ds, "l_quantity", "l_extendedprice")


def _q_connected_components(sf_dir: str):
    """Transitive clustering (M6) on a deterministic chain graph derived
    from documents: edge (d, d+1) whenever d % 7 != 6 — components are
    ≤7-node chains. Upgrades the clustering surface from rows-only to a
    SQL-checked row (recursive-CTE reachability replay)."""
    import pyarrow as pa

    import ray.data

    from record_matcher_ray.pipelines.cluster import connected_components

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def edges(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy().astype(np.int64)
        m = did % 7 != 6
        return pa.table({"u": pa.array(did[m]), "v": pa.array(did[m] + 1)})

    return connected_components(docs.map_batches(edges,
                                                 batch_format="pyarrow"))


def _q_snapshot_diff(sf_dir: str):
    """Incremental corpus diff: a deterministic 'previous snapshot' is
    derived from documents (drop ids %17==0 → added; stale text for
    %13==0 → changed; ghost ids %19==0 → removed) and diffed against the
    current table. Only (id, content-hash, side) ride the exchange."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data

    from record_matcher_ray.pipelines.table_ops import snapshot_diff

    new = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def build_old(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        txt = pc.cast(t["text"], pa.string())
        stale = pc.binary_join_element_wise(txt, " [stale]", "")
        base_txt = pc.if_else(
            pa.array(did % 13 == 0), stale, txt
        )
        keep = pa.array(did % 17 != 0)
        base = pa.table(
            {"doc_id": t["doc_id"].filter(keep),
             "text": base_txt.filter(keep)}
        )
        gmask = did % 19 == 0
        ghosts = pa.table(
            {"doc_id": pa.array(did[gmask] + 1_000_000),
             "text": pc.binary_join_element_wise(
                 "ghost ",
                 pc.cast(pa.array(did[gmask]), pa.string()), ""
             )}
        )
        return pa.concat_tables([base, ghosts])

    old = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(build_old, batch_format="pyarrow")
    return snapshot_diff(old, new)


def _q_building_orders_bloom(sf_dir: str):
    """Same semi join as building_orders_semi, but through the
    Bloom-prefilter + bucketed-verify scale path (key side never
    broadcast raw) — exact result, so the oracle is the plain semi SQL."""
    import pyarrow.compute as pc

    import ray.data

    from record_matcher_ray.pipelines.joins import bloom_semi_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    out = bloom_semi_join(
        orders, keys, on="o_custkey", key_col="c_custkey", bits_log2=18
    ).to_pandas()
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out


def _q_orders_anti_building(sf_dir: str):
    """Anti-join: orders whose customer is NOT in the BUILDING segment
    (broadcast key-set filter with anti=True — no shuffle; the anti twin
    of building_orders_semi)."""
    import pyarrow.compute as pc

    import ray.data

    from record_matcher_ray.pipelines.joins import semi_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    out = semi_join(
        orders, keys, on="o_custkey", key_col="c_custkey", anti=True
    ).to_pandas()
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out


def _q_approx_quantiles(sf_dir: str):
    """Mergeable histogram quantile sketch over order totals — constant
    per-block partials, pinned-order IEEE float math (bit-replayable)."""
    import ray.data

    from record_matcher_ray.pipelines.sketches import approx_quantiles

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )
    return approx_quantiles(
        ds, "o_totalprice", qs=(0.1, 0.5, 0.9, 0.99), n_bins=1024
    )


def _q_redact(sf_dir: str):
    """PII redaction pass — text rewritten with ordered pattern masking;
    oracle is the same nested regexp_replace chain."""
    import ray.data

    from record_matcher_ray.pipelines.pii import redact_pii

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return redact_pii(ds)


def _q_chunks(sf_dir: str):
    """Overlapping token-window chunking (size 64, overlap 16) — the
    retrieval-prep transform; deterministic window starts so the DuckDB
    generate_series mirror matches hash-exactly."""
    import ray.data

    from record_matcher_ray.pipelines.chunking import chunk_documents

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return chunk_documents(ds, size=64, overlap=16)


def _q_top_terms(sf_dir: str):
    """Global top-100 terms with occurrence + document frequency —
    partial factorize+bincount per block, one vocab-sized groupby."""
    import ray.data

    from record_matcher_ray.pipelines.terms import top_terms

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return top_terms(ds, k=100)


def _q_hashed_tfidf(sf_dir: str):
    """Feature-hashing TF-IDF vectors (32 dims), flattened to long format
    (doc_id, dim, tfidf) for the hash compare."""
    import pyarrow as pa

    import ray.data

    from record_matcher_ray.pipelines.terms import hashed_tfidf

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = hashed_tfidf(ds, n_dims=32)

    def flat(t: pa.Table) -> pa.Table:
        feats = t["features"].combine_chunks()
        vals = feats.flatten().to_numpy(zero_copy_only=False)
        ids = np.repeat(t["doc_id"].to_numpy(), 32)
        dims = np.tile(np.arange(32, dtype=np.int64), len(t))
        return pa.table(
            {"doc_id": pa.array(ids), "dim": pa.array(dims),
             "tfidf": pa.array(vals, pa.float64())}
        )

    return out.map_batches(flat, batch_format="pyarrow")


def _hashed_tfidf_oracle(n_dims: int = 32) -> str:
    """Hash-exact replay of terms.hashed_tfidf: token → Horner polynomial
    over the first ≤8 chars (mod 2^64, HUGEINT-reduced every 3rd step) →
    splitmix64 → dim/sign bits; signed tf and df are exact integers, the
    single ln((N+1)/(df+1))+1 double matches libm (CLAUDE.md recipe)."""
    M = _SQL_M
    branches = []
    for length in range(1, 9):
        expr = "ascii(substr(w,1,1))::HUGEINT"
        for kk in range(2, length + 1):
            expr = f"({expr} * 1000003 + ascii(substr(w,{kk},1)))"
            if kk % 3 == 0:
                expr = f"({expr} % {M})"
        branches.append(f"WHEN {length} THEN ({expr}) % {M}")
    poly = "CASE length(w) " + " ".join(branches) + " ELSE 0 END"
    m1 = _sql_mulmod(_sql_xorshift("p", 30), 0xBF58476D1CE4E5B9)
    m2 = _sql_mulmod(_sql_xorshift("h", 27), 0x94D049BB133111EB)
    return f"""
        WITH t AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(coalesce(text, '')),
                                     '[^a-z0-9]+', ' ', 'g')) AS nt
          FROM documents
        ), tok AS (
          SELECT doc_id, unnest(string_split(nt, ' ')) AS term
          FROM t WHERE len(nt) > 0
        ), tokw AS (
          SELECT doc_id, substr(term, 1, 8) AS w FROM tok
        ), poly AS (
          SELECT doc_id, ({poly}) AS p FROM tokw
        ), m1 AS (
          SELECT doc_id, {m1} AS h FROM poly
        ), m2 AS (
          SELECT doc_id, {m2} AS h FROM m1
        ), dims AS (
          SELECT doc_id,
                 (xor(h::UBIGINT, h::UBIGINT >> 31) % {n_dims})::BIGINT
                   AS dim,
                 CASE WHEN (xor(h::UBIGINT, h::UBIGINT >> 31) >> 33) & 1 = 1
                      THEN 1 ELSE -1 END AS sgn
          FROM m2
        ), stf AS (
          SELECT doc_id, dim, sum(sgn)::DOUBLE AS stf
          FROM dims GROUP BY 1, 2
        ), dfd AS (
          SELECT dim, count(DISTINCT doc_id)::BIGINT AS dfd
          FROM dims GROUP BY 1
        ), n AS (SELECT count(*)::BIGINT AS nd FROM documents),
        grid AS (
          SELECT d.doc_id, gs.dim
          FROM documents d,
               (SELECT unnest(generate_series(0, {n_dims - 1}))::BIGINT
                  AS dim) gs
        )
        SELECT g.doc_id, g.dim,
               round(coalesce(s.stf, 0.0)
                     * (ln((n.nd + 1.0) / (coalesce(f.dfd, 0) + 1.0)) + 1.0),
                     6) AS tfidf
        FROM grid g
        LEFT JOIN stf s ON s.doc_id = g.doc_id AND s.dim = g.dim
        LEFT JOIN dfd f ON f.dim = g.dim
        CROSS JOIN n
    """


def _q_inverted_index(sf_dir: str):
    """Inverted-index build (min_df=2, postings capped at 20), exploded to
    (term, df, doc_id) long rows for the hash compare."""
    import pyarrow as pa

    import ray.data

    from record_matcher_ray.pipelines.terms import inverted_index

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = inverted_index(ds, min_df=2, max_postings=20)

    def explode(t: pa.Table) -> pa.Table:
        p = t["postings"].combine_chunks()
        lens = np.diff(p.offsets.to_numpy().astype(np.int64))
        rep = pa.array(np.repeat(np.arange(len(t)), lens))
        return pa.table(
            {"term": t["term"].take(rep),
             "df": t["df"].take(rep),
             "doc_id": p.flatten()}
        )

    return out.map_batches(explode, batch_format="pyarrow")


def _q_bm25(sf_dir: str):
    """BM25 lexical relevance to a fixed query — broadcast idf table from
    one O(|query|)-rows-per-block aggregate pass, zero-shuffle scoring."""
    import ray.data

    from record_matcher_ray.pipelines.terms import bm25_scores

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return bm25_scores(ds, "merge scan vector window",
                       text_col="text", id_col="doc_id")


def _q_retention(sf_dir: str):
    """Daily retention cohorts (cohort day × offset distinct-user counts);
    three vectorized hash exchanges, no per-user Python."""
    import ray.data

    from record_matcher_ray.pipelines.relational import retention_cohorts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return retention_cohorts(ev)


def _q_semantic_decontam(sf_dir: str):
    """Embedding-space decontamination: train = all embeddings, eval =
    every 5th vector; matches = cosine >= 0.9 (catches paraphrase-level
    leakage n-gram/MinHash decontam can't see). Eval matrix broadcast
    once, one zero-shuffle train pass."""
    import ray.data

    from record_matcher_ray.pipelines.similarity import semantic_decontam

    def emb():
        return ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )

    ev = emb().filter(lambda r: r["vec_id"] % 5 == 0)
    return (
        semantic_decontam(emb(), ev, threshold=0.9)
        .to_pandas()
        .sort_values(["train_id", "eval_id"])
        .reset_index(drop=True)
    )


def _q_kmeans(sf_dir: str):
    """Distributed fixed-point k-means assignments over the embeddings
    table (k=8, 5 Lloyd iterations, deterministic hash init) — exact
    integer arithmetic end to end, bit-replayed by the DuckDB oracle."""
    import ray.data

    from record_matcher_ray.pipelines.similarity import kmeans

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    _, assign = kmeans(ds, k=8, iters=5, seed=0)
    return assign.to_pandas().sort_values("vec_id").reset_index(drop=True)


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _q_minhash_signatures(sf_dir: str):
    """Full 64-perm MinHash signatures of every document in long format
    (doc_id, perm, sig) — computed by the SAME kernels the minhash-LSH
    dedup pipeline uses (blocking.batch_char_shingles +
    hashkernels.batch_signatures), so the hash-exact SQL replay pins the
    flagship dedup family's signature math, not a lookalike."""
    import ray.data

    from record_matcher_ray.stages.blocking import MinHasher

    hasher = MinHasher(num_perm=64, seed=1)
    a, b = hasher.a, hasher.b

    def fn(t):
        import numpy as np
        import pyarrow as pa

        from record_matcher_ray.core.hashkernels import (
            batch_signatures,
            normalize_utf8,
        )
        from record_matcher_ray.stages.blocking import batch_char_shingles

        sh_flat, sh_lens = batch_char_shingles(
            normalize_utf8(t["text"]), 4
        )
        sig = batch_signatures(sh_flat, sh_lens, a, b)
        n, num_perm = sig.shape
        ids = np.ascontiguousarray(t["doc_id"].to_numpy(), np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, num_perm)),
                "perm": pa.array(
                    np.tile(np.arange(num_perm, dtype=np.int64), n)
                ),
                "sig": pa.array(sig.ravel()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return (
        ds.map_batches(fn, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "perm"])
        .reset_index(drop=True)
    )


def _q_split_docs(sf_dir: str):
    """Leakage-safe train/val/test split: every exact duplicate of a
    document gets the split of its group REPRESENTATIVE (min doc_id per
    identical text), so no content straddles train and eval."""
    import ray.data

    from record_matcher_ray.pipelines.dedup import tuple_representatives
    from record_matcher_ray.pipelines.sampling import leakage_safe_split

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    reps = tuple_representatives(docs, ["text"], "doc_id")
    return leakage_safe_split(
        reps, _SPLIT_WEIGHTS, key_col="rep", seed=11
    ).to_pandas()[["doc_id", "rep", "split"]]


def _q_rolling_mean(sf_dir: str):
    """Trailing 4-row mean of event value per user — exact integer window
    sums, pinned-order double mean."""
    import ray.data

    from record_matcher_ray.pipelines.relational import rolling_mean

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    return rolling_mean(ds, frame_rows=3)


def _q_interarrival(sf_dir: str):
    """Per-user inter-event gaps (lag delta in μs; first event null)."""
    import ray.data

    from record_matcher_ray.pipelines.relational import interarrival

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return interarrival(ds)


def _q_transitions(sf_dir: str):
    """Per-user ordered event-type bigram (Markov transition) counts."""
    import ray.data

    from record_matcher_ray.pipelines.relational import transition_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return transition_counts(ds)


def _q_rollup(sf_dir: str):
    """ROLLUP(status, priority) counts + exact-cents price sums over
    orders — all three granularities, collapsed dims labelled 'ALL'."""
    import ray.data

    from record_matcher_ray.pipelines.relational import rollup_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )
    return rollup_aggregate(
        ds, ["o_orderstatus", "o_orderpriority"], "o_totalprice"
    )


def _q_pmi(sf_dir: str):
    """Top-vocab PMI co-occurrence over documents (V=48)."""
    import ray.data

    from record_matcher_ray.pipelines.terms import pmi_cooccurrence

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return pmi_cooccurrence(ds, vocab_k=48)


def _q_pca(sf_dir: str):
    """Top principal direction of the embeddings Gram matrix — fixed-point
    power iteration, bit-replayed by a chained-CTE oracle."""
    import ray.data

    from record_matcher_ray.pipelines.stats import top_component

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )
    return top_component(ds, scale_bits=12, iters=6)


def _pca_oracle(d: int = 64, scale_bits: int = 12, iters: int = 6,
                x_scale_bits: int = 20) -> str:
    """Replay of stats.top_component: integer Gram cells, power iteration
    as chained CTEs (floor-div CASE emulates Python // on negatives), one
    pinned-order double readout (HUGEINT casts, IEEE sqrt is exactly
    rounded so loading replays bit-for-bit)."""
    Q = 1 << scale_bits
    S = 1 << x_scale_bits
    sql = [f"""
        WITH q AS (
          SELECT list_transform(embedding,
                   v -> CAST(floor(v::DOUBLE * {float(Q)!r} + 0.5)
                             AS BIGINT)) AS qv
          FROM embeddings
        ), cell AS (
          SELECT r.j AS i, s.j AS j, sum(qv[r.j] * qv[s.j]) AS a
          FROM q
          CROSS JOIN range(1, {d + 1}) r(j)
          CROSS JOIN range(1, {d + 1}) s(j)
          GROUP BY 1, 2
        ), x0 AS (
          SELECT r.j AS j, {S}::HUGEINT AS x FROM range(1, {d + 1}) r(j)
        )"""]
    for t in range(iters):
        sql.append(f""", y{t} AS (
          SELECT c.i AS j, sum(c.a * x.x) AS y
          FROM cell c JOIN x{t} x ON c.j = x.j GROUP BY 1
        ), m{t} AS (SELECT max(abs(y)) AS m FROM y{t}
        ), x{t + 1} AS (
          SELECT j, CASE WHEN (y * {S}) % m <> 0 AND y < 0
                         THEN (y * {S}) // m - 1
                         ELSE (y * {S}) // m END AS x
          FROM y{t}, m{t}
        )""")
    sql.append(f""", den AS (SELECT sum(x * x) AS d2 FROM x{iters}
        ), num AS (
          SELECT sum(c.a * xa.x * xb.x) AS nu
          FROM cell c
          JOIN x{iters} xa ON c.i = xa.j
          JOIN x{iters} xb ON c.j = xb.j
        )
        SELECT t.j,
               round((t.x)::DOUBLE / sqrt((d2)::DOUBLE), 6) AS loading,
               round(((nu)::DOUBLE / (d2)::DOUBLE)
                     / {float(Q * Q)!r}, 6) AS eigval
        FROM x{iters} t CROSS JOIN den CROSS JOIN num
        ORDER BY t.j""")
    return "".join(sql)


def _q_zscore(sf_dir: str):
    """Per-event-type z-score of value — exact integer moments broadcast,
    pinned-order double readout."""
    import ray.data

    from record_matcher_ray.pipelines.stats import zscore_by_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )
    return zscore_by_group(ds, "event_type", "value", "event_id")


def _q_profile(sf_dir: str):
    """Per-column profile of orders: counts, null counts, HLL distinct
    for ints, exact distinct for strings."""
    import ray.data

    from record_matcher_ray.pipelines.sketches import profile_table

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet")
    return profile_table(ds)


def _hll_value_sql(value_expr: str, table: str, p: int = 12) -> str:
    """Scalar HLL-estimate subquery for one integer expression — the
    same splitmix64→(bucket,rho)→register-max→estimator chain as
    `_sketch_oracles` (sketches.py semantics), single implicit group."""
    m = 1 << p
    C264 = "18446744073709551616.0"
    hu = _sql_splitmix64(
        f"(({value_expr})::HUGEINT % {_SQL_M} + {_SQL_M}) % {_SQL_M}"
    )
    alpha = f"(0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / {m}.0))"
    raw = f"(((({alpha} * {m}) * {m}) * {C264}) / (s::DOUBLE))"
    return f"""(
        WITH hf AS (SELECT ({hu}) AS hu FROM {table}),
        br AS (
          SELECT (hu >> {64 - p})::BIGINT AS bucket,
                 ({_sql_mulmod("hu::HUGEINT", m)})::UBIGINT AS rest
          FROM hf
        ), s1 AS (SELECT bucket, rest, (rest | (rest >> 1)) AS x FROM br
        ), s2 AS (SELECT bucket, rest, (x | (x >> 2)) AS x FROM s1
        ), s3 AS (SELECT bucket, rest, (x | (x >> 4)) AS x FROM s2
        ), s4 AS (SELECT bucket, rest, (x | (x >> 8)) AS x FROM s3
        ), s5 AS (SELECT bucket, rest, (x | (x >> 16)) AS x FROM s4
        ), s6 AS (SELECT bucket, rest, (x | (x >> 32)) AS x FROM s5
        ), rt AS (
          SELECT bucket,
                 CASE WHEN rest = 0 THEN {64 - p + 1}
                      ELSE 65 - bit_count(x)::BIGINT END AS rho
          FROM s6
        ), regs AS (SELECT bucket, max(rho) AS reg FROM rt GROUP BY bucket
        ), sums AS (
          SELECT sum(1::HUGEINT << (64 - reg)) AS s_present,
                 count(*) AS n_present
          FROM regs
        ), est AS (
          SELECT s_present + ({m} - n_present)::HUGEINT
                   * (1::HUGEINT << 64) AS s,
                 ({m} - n_present) AS zeros
          FROM sums
        )
        SELECT round(CASE WHEN {raw} <= 2.5::DOUBLE * {m}.0 AND zeros > 0
                          THEN {m} * ln({m}.0 / zeros)
                          ELSE {raw} END, 6)
        FROM est
    )"""


def _profile_orders_oracle() -> str:
    """Replay of sketches.profile_table over the orders table: HLL
    estimates for int columns (nulls hash as 0 — column_hash64
    contract), exact distinct for strings (nulls read ''), counts only
    for double/timestamp columns."""
    int_cols = ["o_orderkey", "o_custkey"]
    str_cols = ["o_orderstatus", "o_orderpriority"]
    none_cols = ["o_totalprice", "o_orderdate"]
    rows = []
    for c in int_cols:
        rows.append(
            f"SELECT '{c}' AS col_name, count(*)::BIGINT AS n, "
            f"(count(*) - count({c}))::BIGINT AS n_null, "
            f"({_hll_value_sql(f'coalesce({c}, 0)', 'orders')})::DOUBLE "
            f"AS n_distinct, 'hll' AS method FROM orders"
        )
    for c in str_cols:
        rows.append(
            f"SELECT '{c}' AS col_name, count(*)::BIGINT AS n, "
            f"(count(*) - count({c}))::BIGINT AS n_null, "
            f"count(DISTINCT coalesce({c}, ''))::DOUBLE AS n_distinct, "
            f"'exact' AS method FROM orders"
        )
    for c in none_cols:
        rows.append(
            f"SELECT '{c}' AS col_name, count(*)::BIGINT AS n, "
            f"(count(*) - count({c}))::BIGINT AS n_null, "
            f"NULL::DOUBLE AS n_distinct, 'none' AS method FROM orders"
        )
    return " UNION ALL ".join(rows)


def _q_distinct_by(sf_dir: str):
    """Exact distinct users per event type (pre-reduced pair exchange)."""
    import ray.data

    from record_matcher_ray.pipelines.table_ops import distinct_count_by

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return distinct_count_by(ds, "event_type", "user_id")


def _q_histogram(sf_dir: str):
    """Fixed-width ($20k) histogram of order totals."""
    import ray.data

    from record_matcher_ray.pipelines.table_ops import histogram

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )
    return histogram(ds, "o_totalprice", width_cents=2_000_000)


def _q_ntile(sf_dir: str):
    """Quartile band per order within its status (SQL ntile replay)."""
    import ray.data

    from record_matcher_ray.pipelines.relational import ntile_by_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    )
    return ntile_by_group(
        ds, "o_orderstatus", "o_totalprice", "o_orderkey", k=4
    )


def _q_intervals(sf_dir: str):
    """SCD2 validity intervals of each user's event_type runs."""
    import ray.data

    from record_matcher_ray.pipelines.relational import value_intervals

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return value_intervals(ds)


def _q_pivot(sf_dir: str):
    """Crosstab: order counts per status × priority (wide columns)."""
    import ray.data

    from record_matcher_ray.pipelines.relational import pivot_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority"],
    )
    return pivot_counts(
        ds, "o_orderstatus", "o_orderpriority",
        ["1-URGENT", "2-HIGH", "3-MEDIUM"],
    )


def _q_twap(sf_dir: str):
    """Time-weighted average event value per user (left-continuous
    holding intervals, exact integer weighted sums)."""
    import ray.data

    from record_matcher_ray.pipelines.relational import time_weighted_avg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    return time_weighted_avg(ds)


def _q_winsorize(sf_dir: str):
    """Per-source winsorization of document lengths at [0.05, 0.95] —
    clip-to-band twin of quantile_filter_docs (rows kept, values
    clamped)."""
    import ray.data

    from record_matcher_ray.pipelines.table_ops import winsorize_by_quantile

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
    )
    return winsorize_by_quantile(
        ds, "n_chars", q_lo=0.05, q_hi=0.95, group_cols=["source"]
    )


_BLOCKLIST = ["spark", "slow query", "vector", "forbidden phrase"]


def _q_normalize_text(sf_dir: str):
    """Unicode NFC + lowercase + whitespace canonicalization over the
    document corpus — utf8proc/RE2 on both sides is what makes the oracle
    hash-exact."""
    import ray.data

    from record_matcher_ray.pipelines.analysis import normalize_text

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return normalize_text(ds)


def _q_blocklist(sf_dir: str):
    """Broadcast phrase-blocklist screening: per doc the number of listed
    phrases present and a keep flag (rows flagged, not dropped)."""
    import ray.data

    from record_matcher_ray.pipelines.analysis import blocklist_filter

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return blocklist_filter(ds, _BLOCKLIST)


def _q_char_entropy(sf_dir: str):
    """Per-document Shannon character entropy (gibberish / single-char-
    spam quality signal) with the ordered-fold float recipe."""
    import ray.data

    from record_matcher_ray.pipelines.analysis import char_entropy

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return char_entropy(ds)


def _q_triangles(sf_dir: str):
    """Exact triangle count of the order↔customer mod-512 contact graph
    (degree-oriented wedge counting — each triangle counted once at its
    rank-minimal vertex)."""
    import pyarrow as pa

    import ray.data

    from record_matcher_ray.pipelines.graph import triangle_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {"src": pa.array(t["o_orderkey"].to_numpy() % 512),
             "dst": pa.array(t["o_custkey"].to_numpy() % 512)}
        )

    return triangle_count(ds.map_batches(edges, batch_format="pyarrow"))


def _q_resample(sf_dir: str):
    """Per-user daily event counts with empty days gap-filled to 0
    between each user's first and last event."""
    import ray.data

    from record_matcher_ray.pipelines.relational import resample_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return resample_counts(ds)


def _q_robust_z(sf_dir: str):
    """Median/MAD robust z-score of event values within each event type
    (cents-quantized so every median/MAD is an exact dyadic double)."""
    import ray.data

    from record_matcher_ray.pipelines.stats import robust_zscore

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )
    return robust_zscore(ds, "event_type", "value", "event_id")


def _q_running_total(sf_dir: str):
    """Per-user cumulative event-value sum (exact integer prefix sums,
    one pinned-order division)."""
    import ray.data

    from record_matcher_ray.pipelines.relational import running_total

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    return running_total(ds)


def _q_pct_rank(sf_dir: str):
    """percent_rank of each order's total within its status (min-rank
    ties; bit-identical small-integer division)."""
    import ray.data

    from record_matcher_ray.pipelines.relational import percent_rank_by_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    )
    return percent_rank_by_group(
        ds, "o_orderstatus", "o_totalprice", "o_orderkey"
    )


def _q_mode(sf_dir: str):
    """Dominant order priority per status (count desc, value asc
    tie-break)."""
    import ray.data

    from record_matcher_ray.pipelines.table_ops import mode_by_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority"],
    )
    return mode_by_group(ds, "o_orderstatus", "o_orderpriority")


def _q_rolling_active(sf_dir: str):
    """Trailing-7-day distinct active users per day (WAU curve) via the
    interval-stab prefix-sum layout — exact, no per-window re-scan."""
    import ray.data

    from record_matcher_ray.pipelines.relational import rolling_active

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return rolling_active(ds, window_days=7)


def _q_script_profile(sf_dir: str):
    """Per-document Unicode-script census (latin/digit/space/cyrillic/
    cjk/other counts) — multilingual routing signal."""
    import ray.data

    from record_matcher_ray.pipelines.analysis import script_profile

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return script_profile(ds)


def _q_row_number(sf_dir: str):
    """Dense global row numbers over orders by (totalprice, orderkey) —
    one sort exchange + broadcast block offsets, no second shuffle."""
    import ray.data

    from record_matcher_ray.pipelines.relational import global_row_number

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    return global_row_number(ds, ["o_totalprice", "o_orderkey"])


def _q_seq_pattern(sf_dir: str):
    """MATCH_RECOGNIZE-lite: per user, count click+→purchase arcs in the
    (ts, id)-ordered event-type sequence."""
    import ray.data

    from record_matcher_ray.pipelines.relational import sequence_pattern_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return sequence_pattern_counts(
        ds, "c+p",
        {"click": "c", "error": "e", "purchase": "p",
         "signup": "s", "view": "v"},
    )


def _q_snm_pairs(sf_dir: str):
    """Sorted-neighborhood blocking over customers ordered by
    (c_name, c_custkey), window 5 → candidate pairs (x_id, y_id, gap)."""
    import ray.data

    from record_matcher_ray.pipelines.relational import (
        sorted_neighborhood_pairs,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    return sorted_neighborhood_pairs(
        ds, ["c_name", "c_custkey"], "c_custkey", window=5
    )


def _q_soundex(sf_dir: str):
    """Simplified-Soundex phonetic blocking keys over part names —
    zero-shuffle vectorized byte pass, (p_partkey, soundex)."""
    import ray.data

    from record_matcher_ray.pipelines.analysis import soundex_codes

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    return soundex_codes(ds, "p_name", "p_partkey")


def _q_pareto(sf_dir: str):
    """2-D Pareto frontier (anti-dominance skyline) of orders maximizing
    (o_totalprice, o_orderdate) — per-block local frontiers via one
    lexsort + prefix max, tiny driver merge, zero shuffle
    (table_ops.pareto_frontier)."""
    import ray.data

    from record_matcher_ray.pipelines.table_ops import pareto_frontier

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet")
    return pareto_frontier(ds, "o_totalprice", "o_orderdate")


def _q_explode(sf_dir: str):
    """posexplode of embedding vectors → (vec_id, pos, val::DOUBLE)."""
    import pyarrow as pa
    import pyarrow.compute as _pc

    import ray.data

    from record_matcher_ray.pipelines.table_ops import explode_list

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = explode_list(ds, "embedding", "vec_id")

    def widen(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("val")
        return t.set_column(i, "val", _pc.cast(t["val"], pa.float64()))

    return out.map_batches(widen, batch_format="pyarrow")


def _q_centroid_cosine(sf_dir: str):
    """Pairwise cosine between per-label embedding centroids (exact
    integer sums; one division + two IEEE sqrts per pair)."""
    import ray.data

    from record_matcher_ray.pipelines.similarity import label_centroid_cosine

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    return label_centroid_cosine(ds)


def _q_quantile_filter(sf_dir: str):
    """Per-source [0.1, 0.9] length-quantile band filter over documents —
    the quality-curation primitive (trim per-source outliers); exact
    thresholds rounded to 6 decimals so the boundary decision is
    deterministic on both sides."""
    import ray.data

    from record_matcher_ray.pipelines.table_ops import filter_by_quantile

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
    )
    return filter_by_quantile(
        ds, "n_chars", q_lo=0.1, q_hi=0.9, group_cols=["source"]
    )


def _q_countmin(sf_dir: str):
    """Count-min frequency estimates of custkeys 1-20 over orders
    (width=512 < distinct keys, so real over-count collisions are in
    play) — counters built by exact-integer partial addition, replayed
    cell-for-cell by the SQL oracle."""
    import pandas as pd
    import ray.data

    from record_matcher_ray.pipelines.sketches import cm_estimate, count_min

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )
    counters = count_min(ds, "o_custkey", width=512, depth=4, seed=0)
    keys = np.arange(1, 21, dtype=np.int64)
    return pd.DataFrame(
        {
            "custkey": keys,
            "est_count": cm_estimate(counters, keys, seed=0).astype(np.int64),
        }
    )


def _q_kmv(sf_dir: str):
    """KMV bottom-k distinct sketch over o_custkey (k=256): per-block
    bottom-k hash partials, driver merge, (k-1)·2^64/h_k estimator."""
    import ray.data

    from record_matcher_ray.pipelines.sketches import kmv_distinct

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )
    return kmv_distinct(ds, "o_custkey", k=256)


def _q_kmv_setops(sf_dir: str):
    """KMV set-operation estimates (k=256) between the distinct
    o_custkey set of orders and the c_custkey set of customer:
    union / Jaccard / intersection from two bottom-k sketches."""
    import ray.data

    from record_matcher_ray.pipelines.sketches import kmv_set_ops

    a = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )
    b = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    return kmv_set_ops(a, b, "o_custkey", "c_custkey", k=256)


def _q_approx_distinct(sf_dir: str):
    """HyperLogLog approximate distinct o_custkey per o_orderstatus plus
    a global 'ALL' row (p=12) — fixed-size mergeable partials, raw
    values never shuffle (sketches.py)."""
    import pandas as pd
    import ray.data

    from record_matcher_ray.pipelines.sketches import approx_distinct

    def orders():
        return ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderstatus"],
        )

    per = approx_distinct(orders(), "o_custkey", group_col="o_orderstatus")
    glob = approx_distinct(orders(), "o_custkey", group_col=None)
    return (
        pd.concat([per, glob], ignore_index=True)
        .sort_values("grp")
        .reset_index(drop=True)
    )


def _q_funnel(sf_dir: str):
    """Ordered view→click→purchase funnel per user (greedy earliest
    completion, strict ts ordering); bucketed segmented-min passes."""
    import ray.data

    from record_matcher_ray.pipelines.relational import funnel_steps

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    return funnel_steps(ev, ["view", "click", "purchase"])


def _q_events_in_window(sf_dir: str):
    """Equi+range self join: non-signup events inside the 10 minutes after
    a signup by the SAME user, then a tiny aggregate. Shuffle key is a
    hash bucket of the equi key; each bucket joins in one Acero call +
    vectorized range filter; the per-pair aggregate is pre-reduced per
    block (integer cents so the sum is order-independent and hash-exact
    vs DuckDB)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data
    from ray.data.aggregate import Sum

    from record_matcher_ray.pipelines.joins import range_join

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_type", "value"],
    )

    def points(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["event_type"], "signup"))

    def windows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "signup"))
        ten_min = pa.scalar(10 * 60 * 1_000_000, pa.duration("us"))
        return pa.table(
            {
                "s_user": t["user_id"].combine_chunks(),
                "w_start": t["ts"].combine_chunks(),
                "w_end": pc.add(t["ts"], ten_min),
            }
        )

    joined = range_join(
        events.map_batches(points, batch_format="pyarrow"),
        events.map_batches(windows, batch_format="pyarrow"),
        left_point="ts",
        right_lo="w_start",
        right_hi="w_end",
        left_on="user_id",
        right_on="s_user",
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(cents=(df["value"] * 100).round().astype("int64"))
        return (
            df.groupby("event_type", as_index=False)
            .agg(n=("cents", "size"), cents=("cents", "sum"))
        )

    agg = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n"), Sum("cents"))
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "n_events": df["sum(n)"].astype("int64"),
                "sum_cents": df["sum(cents)"].astype("int64"),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def _q_quantiles(sf_dir: str):
    """Exact per-group quantiles of o_totalprice by order status — hash
    BUCKET of the group key is the shuffle key (never the raw column),
    all of a bucket's groups resolved in one vectorized lexsort pass."""
    import ray.data

    from record_matcher_ray.pipelines.table_ops import grouped_quantiles

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_totalprice"]
    )
    return grouped_quantiles(ds, ["o_orderstatus"], "o_totalprice")


def _q_repetition(sf_dir: str):
    """Gopher-style repetition quality signals (dup-token fraction, top
    2/3-gram fractions) — count-based variants so the DuckDB string-gram
    oracle checks them exactly."""
    import ray.data

    from record_matcher_ray.pipelines.analysis import repetition_metrics

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return repetition_metrics(ds)


def _q_pack_docs(sf_dir: str):
    """Sequence packing into 512-token bins, next-fit over doc_id order.
    The query pins a canonical packing (one block, one batch, sorted
    ids) so the DuckDB recursive-CTE replay of the next-fit recurrence
    checks it exactly; at scale packing is partition-local by design."""
    import ray.data

    from record_matcher_ray.pipelines.analysis import token_counts
    from record_matcher_ray.pipelines.packing import pack_sequences

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=1,
    )
    tc = token_counts(ds).select_columns(["doc_id", "n_ws_tokens"])
    return pack_sequences(
        tc.sort("doc_id").repartition(1), 512,
        token_col="n_ws_tokens", batch_size=1 << 22,
    ).drop_columns(["doc_ids"])


def _q_shuffle_docs(sf_dir: str):
    """First 100 documents in seeded global shuffle order with their
    positions — proves the deterministic epoch-shuffle ORDER end to end
    (the driver compare is order-insensitive, so the position column
    carries the order into the hash check)."""
    import ray.data

    from record_matcher_ray.pipelines.sampling import deterministic_shuffle

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    head = (
        deterministic_shuffle(ds, "doc_id", seed=7)
        .limit(100)
        .to_pandas()
    )
    head["pos"] = np.arange(len(head), dtype=np.int64)
    return head[["pos", "doc_id"]]


def _q_sample_docs(sf_dir: str):
    """Deterministic 10% uniform sample by splitmix64(doc_id ^ seed) —
    the oracle reproduces the hash bit-exactly in SQL (32-bit-split
    modular multiplication), so this is a full hash-checked query."""
    import ray.data

    from record_matcher_ray.pipelines.sampling import hash_sample

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return hash_sample(ds, "doc_id", 0.1, seed=42)


def _q_weighted_sample(sf_dir: str):
    """Length-proportional importance sample (p = min(n_chars, 800)/800)
    — exact integer predicate, hash-replayed bit-exactly in SQL."""
    import ray.data

    from record_matcher_ray.pipelines.sampling import importance_sample

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return importance_sample(ds, "doc_id", "n_chars", denom=800, seed=13)


def _q_stratified_docs(sf_dir: str):
    """At most 20 docs per language, chosen by deterministic hash order
    (row_number over sample_hash in the SQL oracle)."""
    import ray.data

    from record_matcher_ray.pipelines.sampling import stratified_cap

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return stratified_cap(ds, "lang", 20, "doc_id", seed=7)


def _q_mix_docs(sf_dir: str):
    """Weighted source mixing: per-source deterministic keep-rates (the
    training-mixture primitive); unlisted sources get the default rate."""
    import ray.data

    from record_matcher_ray.pipelines.sampling import weighted_mix

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    return weighted_mix(
        ds, "source", {"src0": 1.0, "src1": 0.5, "src2": 0.25},
        "doc_id", seed=3, default_rate=0.1,
    )


def _q_media_features(sf_dir: str):
    import ray.data

    from record_matcher_ray.stages.multimodal import featurize_media, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(n=96, seed=3))
    return featurize_media(ds, decoder="fake", concurrency=2)


def _q_media_frames(sf_dir: str):
    """Video frame sampling (2 fps, one row per frame) — the multimodal
    expansion shape (actor pool, per-row fan-out, binary frame payloads);
    decode honestly stubbed. The resize stage is tested in
    tests/test_operators.py."""
    import ray.data

    from record_matcher_ray.stages.multimodal import (
        sample_frames,
        synth_media_table,
    )

    ds = ray.data.from_arrow(synth_media_table(n=96, seed=3))
    return sample_frames(ds, fps=2.0, concurrency=2)


def _q_media_real(sf_dir: str):
    """REAL multimodal decode end-to-end (r3/r4): genuinely decodable PNG
    images, PCM-WAV audio and AVI video (raw-DIB / MPNG frames) flow
    through resize (decode → nearest-resize → re-encode) then featurize
    with ``decoder='real'`` (stdlib codecs — stages/mediacodec.py;
    PIL/pyav picked up via import guards when present). Deterministic
    outputs (content-derived features, no RNG), so the driver's rows-only
    check sees a stable table. r4 closed the video stub: every kind now
    decodes for real (decoded=True for ALL rows) and the video payloads
    additionally ride FrameSampler(mode='real')."""
    import pandas as pd
    import ray.data

    from record_matcher_ray.stages.multimodal import (
        featurize_media,
        resize_media,
        sample_frames,
        synth_media_table,
    )

    tbl = synth_media_table(n=96, seed=3, real_payloads=True)
    ds = ray.data.from_arrow(tbl)
    feats = featurize_media(
        resize_media(ds, 8, 8, mode="real", concurrency=2),
        decoder="real", on_undecodable="null", concurrency=2,
    ).take_batch(200, batch_format="pyarrow")
    # real frame sampling over the same table: per-video frame counts
    frames = sample_frames(
        ray.data.from_arrow(tbl), fps=4.0, mode="real", concurrency=2
    ).take_batch(1000, batch_format="pyarrow")
    import collections

    nframes = collections.Counter(frames["media_id"].to_pylist())
    fl = feats["features"].to_pylist()
    return pd.DataFrame(
        {
            "media_id": feats["media_id"].to_pylist(),
            "kind": feats["kind"].to_pylist(),
            "n_bytes": feats["n_bytes"].to_pylist(),
            "decoded": [f is not None for f in fl],
            "feat_mean": [
                round(float(np.mean(f)), 6) if f is not None else None
                for f in fl
            ],
            "n_real_frames": [
                nframes.get(m, 0) for m in feats["media_id"].to_pylist()
            ],
        }
    ).sort_values("media_id").reset_index(drop=True)


def _q_dup_span_stats(sf_dir: str):
    """Substring-level dedup stats: per doc, the fraction of its 16-char
    normalized windows whose content recurs in ≥2 distinct documents
    (windowed-fingerprint form of suffix-array substring dedup)."""
    import ray.data

    from record_matcher_ray.pipelines.spandedup import duplicated_window_stats

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return duplicated_window_stats(ds, window=16, stride=1, min_docs=2)


def _q_dup_spans(sf_dir: str):
    """Merged byte spans (normalized-text coordinates) covered by
    cross-document duplicated 16-char windows."""
    import ray.data

    from record_matcher_ray.pipelines.spandedup import duplicate_spans

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return duplicate_spans(ds, window=16, stride=1, min_docs=2)


def _q_strip_spans(sf_dir: str):
    """Normalized text with cross-document duplicated 16-char window spans
    cut out (suffix-array-style substring dedup, remove form)."""
    import ray.data

    from record_matcher_ray.pipelines.spandedup import strip_duplicate_spans

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return strip_duplicate_spans(ds, window=16, stride=1, min_docs=2)


def _q_lm_quality(sf_dir: str):
    """Unigram-LM cross-entropy (perplexity-filter signal), model trained
    on the corpus itself (vocab 4096, add-1 OOV floor)."""
    import ray.data

    from record_matcher_ray.pipelines.analysis import lm_quality

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return lm_quality(ds, vocab_size=4096, alpha=1.0)


def _q_orders_customer_full(sf_dir: str):
    """Full-outer bucketed hash join: every order with its customer's
    balance, plus customers with no orders (null order side). Key columns
    are cast DOUBLE on both sides so nullable ints hash identically."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from record_matcher_ray.pipelines.joins import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )
    out = hash_join(orders, cust, "o_custkey", "c_custkey", how="full")

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.float64()),
                "o_custkey": pc.cast(t["o_custkey"], pa.float64()),
                "c_acctbal": pc.cast(t["c_acctbal"], pa.float64()),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def _q_edjoin(sf_dir: str):
    """Exact edit-distance similarity self-join over part names (Ed-Join
    family: q-gram count-filter candidates + Myers bit-parallel verify +
    dup-group expansion) → (x_id, y_id, dist) for dist ≤ 2."""
    import ray.data

    from record_matcher_ray.pipelines.linkage import edit_distance_self_join

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    return edit_distance_self_join(
        ds, "p_name", "p_partkey", max_dist=2, q=2
    )


def _q_fellegi_sunter(sf_dir: str):
    """Fellegi-Sunter probabilistic linkage over nation-blocked customer
    pairs, comparing (mktsegment, acctbal-band-of-100): u-probabilities
    from exact value-frequency sums of squares, log-likelihood weights,
    match/possible/nonmatch at (4.0, 0.0)."""
    import numpy as np
    import ray.data

    from record_matcher_ray.pipelines.linkage import fellegi_sunter_link

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet")

    def add_band(t):
        import numpy as np
        import pyarrow as pa

        b = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) / 100.0
        ).astype(np.int64)
        return t.append_column("band", pa.array(b))

    return fellegi_sunter_link(
        ds.map_batches(add_band, batch_format="pyarrow"),
        "c_custkey",
        "c_nationkey",
        ["c_mktsegment", "band"],
        t_upper=4.0,
        t_lower=0.0,
    )


def _q_metablock(sf_dir: str):
    """Token blocking + meta-blocking with Weighted Edge Pruning over
    part (name, brand, type) tokens → candidate pairs with CBS weight
    strictly above the global mean weight."""
    import ray.data

    from record_matcher_ray.pipelines.linkage import metablock_wep_pairs

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_brand", "p_type"],
    )
    return metablock_wep_pairs(
        ds, "p_partkey", ["p_name", "p_brand", "p_type"]
    )


def _q_mutual_nn(sf_dir: str):
    """Mutual (reciprocal top-1) nearest neighbors under exact quantized
    cosine — the high-precision embedding-ER seed pairs."""
    import ray.data

    from record_matcher_ray.pipelines.similarity import (
        mutual_nearest_neighbors,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return mutual_nearest_neighbors(ds)


def _q_heavy_hitters(sf_dir: str):
    """Exact frequent customers (count·1000 > N) via the two-phase
    local-candidates algorithm — no raw-key groupby, zero shuffles."""
    import ray.data

    from record_matcher_ray.pipelines.sketches import heavy_hitters

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )
    return heavy_hitters(ds, "o_custkey", 1000)


def _q_grouped_corr(sf_dir: str):
    """Per-returnflag Pearson correlation of quantity vs extendedprice
    from exact integer moment partials (grouped linear_fit sibling)."""
    import ray.data

    from record_matcher_ray.pipelines.stats import grouped_corr

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return grouped_corr(
        ds, "l_returnflag", "l_quantity", "l_extendedprice"
    )


def _q_band_join(sf_dir: str):
    """Numeric band self-join: order pairs within $10 of each other,
    grid-blocked with ±1-cell emission and exact IEEE verification."""
    import ray.data

    from record_matcher_ray.pipelines.linkage import band_self_join

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    return band_self_join(ds, "o_totalprice", "o_orderkey", 10.0)


def _q_golden_record(sf_dir: str):
    """End-to-end ER merge: edit-distance name pairs (d ≤ 1) →
    connected components → survivorship golden records (mode brand,
    max price, min size) — one canonical row per entity cluster."""
    import ray.data

    from record_matcher_ray.pipelines.cluster import connected_components
    from record_matcher_ray.pipelines.joins import hash_join
    from record_matcher_ray.pipelines.linkage import (
        edit_distance_self_join,
        survivorship,
    )

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_brand", "p_retailprice",
                 "p_size"],
    )
    pairs = edit_distance_self_join(
        part.select_columns(["p_partkey", "p_name"]),
        "p_name", "p_partkey", max_dist=1, q=2,
    )

    def as_edges(t):
        import pyarrow as pa

        return pa.table({"u": t["x_id"], "v": t["y_id"]})

    cc = connected_components(
        pairs.map_batches(as_edges, batch_format="pyarrow"), "u", "v"
    )
    lab = hash_join(part, cc, "p_partkey", "node", how="left")

    def fill(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        comp = pc.coalesce(
            pc.cast(t["component"], pa.int64()),
            pc.cast(t["p_partkey"], pa.int64()),
        )
        return t.drop_columns(["component"]).append_column("cluster", comp)

    lab = lab.map_batches(fill, batch_format="pyarrow")
    return survivorship(
        lab, "cluster",
        [("p_brand", "mode"), ("p_retailprice", "max"), ("p_size", "min")],
    )


def _q_blocking_quality(sf_dir: str):
    """Blocking evaluation: metablocking-WEP candidates vs exact-name
    truth pairs → reduction ratio / pairs completeness / pairs quality."""
    import ray.data

    from record_matcher_ray.pipelines.linkage import (
        blocking_quality,
        edit_distance_self_join,
        metablock_wep_pairs,
    )

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_brand", "p_type"],
    )
    cand = metablock_wep_pairs(
        part, "p_partkey", ["p_name", "p_brand", "p_type"]
    )
    truth = edit_distance_self_join(
        part.select_columns(["p_partkey", "p_name"]),
        "p_name", "p_partkey", max_dist=0, q=2,
    )
    return blocking_quality(cand, truth, part.count())


def _q_next_purchase(sf_dir: str):
    """FORWARD as-of join: for every event, the timestamp of that user's
    next (or simultaneous) purchase — the forward twin of
    `last_error_asof` (joins.asof_join direction="forward")."""
    import pandas as pd
    import ray.data

    from record_matcher_ray.pipelines.joins import asof_join

    left = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def purchases(t):
        import pyarrow.compute as _pc

        return (
            t.filter(_pc.equal(t["event_type"], "purchase"))
            .select(["user_id", "ts"])
            .rename_columns(["user_id", "purchase_ts"])
        )

    right = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).map_batches(purchases, batch_format="pyarrow")
    out = asof_join(
        left, right, by="user_id", left_on="ts",
        right_on="purchase_ts", direction="forward",
    ).to_pandas()
    return pd.DataFrame(
        {"event_id": out["event_id"].astype("int64"),
         "next_purchase_ts": out["purchase_ts"]}
    )


def _q_grouped_entropy(sf_dir: str):
    """Per-nation Shannon entropy of the market-segment mix — categorical
    diversity profiling with the pinned ordered-fold float recipe."""
    import ray.data

    from record_matcher_ray.pipelines.stats import grouped_entropy

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment"],
    )
    return grouped_entropy(ds, "c_nationkey", "c_mktsegment")


def _q_token_sort(sf_dir: str):
    """Token-sort Levenshtein similarity over distinct part-name pairs
    sharing a token — the distributed form of the registered
    token_sort_ratio scorer."""
    import ray.data

    from record_matcher_ray.pipelines.linkage import (
        token_sort_similarity_pairs,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_name"]
    )
    return token_sort_similarity_pairs(ds, "p_name")


def _q_bfs_hops(sf_dir: str):
    """Shortest hop counts from part node 0 over the bidirectional
    part↔supplier lineitem graph (the PageRank edge set) — bounded BFS,
    replayed by a depth-bounded WITH RECURSIVE oracle."""
    import ray.data

    from record_matcher_ray.pipelines.graph import bfs_hops

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def edges(t):
        import numpy as np
        import pyarrow as pa

        p = t["l_partkey"].to_numpy().astype(np.int64)
        s = t["l_suppkey"].to_numpy().astype(np.int64) + _PR_OFF
        return pa.table(
            {"src": pa.array(np.concatenate([p, s])),
             "dst": pa.array(np.concatenate([s, p]))}
        )

    return bfs_hops(
        li.map_batches(edges, batch_format="pyarrow"), 0, max_hops=8
    )


def _q_compare_vectors(sf_dir: str):
    """ER comparison vectors over nation-blocked customer pairs:
    name Levenshtein similarity, segment equality, balance |Δ| — the
    feature-generation step a linkage classifier consumes."""
    import ray.data

    from record_matcher_ray.pipelines.linkage import compare_vectors

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet")
    return compare_vectors(
        ds, "c_custkey", "c_nationkey",
        [("c_name", "lev"), ("c_mktsegment", "exact"),
         ("c_acctbal", "absdiff")],
    )


def _q_window_dedupe(sf_dir: str):
    """Windowed dedup: first event per (user, type, hour) — the
    telemetry-burst / at-least-once-delivery collapse."""
    import ray.data

    from record_matcher_ray.pipelines.table_ops import window_dedupe

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    return window_dedupe(
        ds, ["user_id", "event_type"], "ts", "event_id", 3600
    )


def _q_jw_prefix(sf_dir: str):
    """Prefix-blocked Jaro-Winkler self-join over distinct part names
    (jw ≥ 75 within 2-char-prefix blocks)."""
    import ray.data

    from record_matcher_ray.pipelines.linkage import jw_prefix_join

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_name"]
    )
    return jw_prefix_join(ds, "p_name", threshold=75.0, prefix_len=2)


def _q_cube(sf_dir: str):
    """GROUP BY CUBE over (status, priority) with exact-cents sums —
    every dimension subset, not just the rollup prefix chain."""
    import ray.data

    from record_matcher_ray.pipelines.relational import cube_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )
    return cube_aggregate(
        ds, ["o_orderstatus", "o_orderpriority"], "o_totalprice"
    )


def _q_er_pipeline(sf_dir: str):
    """The full ER pipeline in one composition: nation blocking →
    Fellegi-Sunter classification → connected components over 'match'
    edges → survivorship golden records (mode segment, max balance).
    Every stage is the already-oracle-pinned operator; the SQL replay
    chains the same algebra end to end."""
    import ray.data

    from record_matcher_ray.pipelines.cluster import connected_components
    from record_matcher_ray.pipelines.joins import hash_join
    from record_matcher_ray.pipelines.linkage import (
        fellegi_sunter_link,
        survivorship,
    )

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet")

    def add_band(t):
        import numpy as np
        import pyarrow as pa

        b = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) / 100.0
        ).astype(np.int64)
        return t.append_column("band", pa.array(b))

    fs = fellegi_sunter_link(
        cust.map_batches(add_band, batch_format="pyarrow"),
        "c_custkey", "c_nationkey", ["c_mktsegment", "band"],
        t_upper=4.0, t_lower=0.0,
    )

    def match_edges(t):
        import pyarrow as pa
        import pyarrow.compute as _pc

        m = t.filter(_pc.equal(t["decision"], "match"))
        return pa.table({"u": m["x_id"], "v": m["y_id"]})

    cc = connected_components(
        fs.map_batches(match_edges, batch_format="pyarrow"), "u", "v"
    )
    lab = hash_join(
        cust.select_columns(["c_custkey", "c_mktsegment", "c_acctbal"]),
        cc, "c_custkey", "node", how="left",
    )

    def fill(t):
        import pyarrow as pa
        import pyarrow.compute as _pc

        comp = _pc.coalesce(
            _pc.cast(t["component"], pa.int64()),
            _pc.cast(t["c_custkey"], pa.int64()),
        )
        return t.drop_columns(["component"]).append_column("cluster", comp)

    return survivorship(
        lab.map_batches(fill, batch_format="pyarrow"),
        "cluster",
        [("c_mktsegment", "mode"), ("c_acctbal", "max")],
    )


def _q_grouped_linear_fit(sf_dir: str):
    """Per-returnflag OLS trend of extendedprice vs quantity from exact
    integer moment partials (grouped sibling of linear_fit_lineitem)."""
    import ray.data

    from record_matcher_ray.pipelines.stats import grouped_linear_fit

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return grouped_linear_fit(
        ds, "l_returnflag", "l_quantity", "l_extendedprice"
    )


def _q_weighted_topk(sf_dir: str):
    """Fixed-size weighted sample without replacement (Efraimidis-
    Spirakis A-ES): 50 documents drawn proportionally to n_chars."""
    import ray.data

    from record_matcher_ray.pipelines.sampling import weighted_topk

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return weighted_topk(ds, "doc_id", "n_chars", 50, seed=2)


def _q_basket_pairs(sf_dir: str):
    """Frequent item pairs (level-2 Apriori): parts co-ordered in >= 2
    orders, exact basket support."""
    import ray.data

    from record_matcher_ray.pipelines.itemsets import basket_pairs

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return basket_pairs(ds, "l_orderkey", "l_partkey", min_support=2)


def _q_psi(sf_dir: str):
    """Numeric drift monitor: PSI of order totalprice per priority
    class vs the corpus blend (fixed bins, add-1 smoothing)."""
    import ray.data

    from record_matcher_ray.pipelines.stats import psi_numeric

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
    )
    return psi_numeric(
        ds, "o_totalprice", "o_orderpriority",
        lo=0.0, hi=400000.0, n_bins=10,
    )


def _q_ewma(sf_dir: str):
    """Per-user EWMA level of event values (α=0.2, (ts, id) fold
    order, first value seeds the state)."""
    import ray.data

    from record_matcher_ray.pipelines.relational import ewma_by_key

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value", "event_id"],
    )
    return ewma_by_key(ds, "user_id", "ts", "value", "event_id",
                       alpha=0.2)


def _q_attribution(sf_dir: str):
    """Last-touch attribution: purchases credit the user's most recent
    preceding click/view within a 7-day lookback."""
    import ray.data

    from record_matcher_ray.pipelines.relational import (
        attribute_conversions,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return attribute_conversions(ds)


def _q_attribution_first(sf_dir: str):
    """First-touch attribution: purchases credit the user's FIRST
    preceding click/view (unattributed if outside 7 days)."""
    import ray.data

    from record_matcher_ray.pipelines.relational import (
        attribute_conversions,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return attribute_conversions(ds, touch="first")


def _q_interval_union(sf_dir: str):
    """Gaps-and-islands coverage: 1-hour exposure windows per event,
    merged into maximal islands per user."""
    import ray.data

    from record_matcher_ray.pipelines.relational import (
        interval_union_by_key,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id"],
    )
    return interval_union_by_key(ds, "user_id", "ts", "event_id",
                                 duration_us=3_600_000_000)


def _q_gini(sf_dir: str):
    """Gini concentration of order spend per priority class."""
    import ray.data

    from record_matcher_ray.pipelines.stats import gini_by_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
    )
    return gini_by_group(ds, "o_orderpriority", "o_totalprice")


def _q_theil(sf_dir: str):
    """Theil T inequality of order spend per priority class."""
    import ray.data

    from record_matcher_ray.pipelines.stats import theil_by_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
    )
    return theil_by_group(ds, "o_orderpriority", "o_totalprice")


def _q_welch(sf_dir: str):
    """Welch two-sample t-test per order priority: does o_totalprice
    differ between status 'F' and status 'O' orders?"""
    import ray.data

    from record_matcher_ray.pipelines.stats import welch_t_by_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )
    return welch_t_by_group(
        ds, "o_orderpriority", "o_orderstatus", "o_totalprice",
        "F", "O",
    )


def _q_cusum(sf_dir: str):
    """Per-user two-sided CUSUM drift statistics of event values
    (target 0, slack 0.5, alarm threshold 40, (ts, id) fold order)."""
    import ray.data

    from record_matcher_ray.pipelines.relational import cusum_by_key

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value", "event_id"],
    )
    return cusum_by_key(ds, "user_id", "ts", "value", "event_id",
                        target=0.0, slack=0.5, threshold=40.0)


def _q_soft_tfidf(sf_dir: str):
    """SoftTFIDF similarity join over distinct part names (2-char
    prefix blocks, token-JW theta 90, score threshold 40)."""
    import ray.data

    from record_matcher_ray.pipelines.linkage import soft_tfidf_join

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_name"]
    )
    return soft_tfidf_join(ds, "p_name", theta=90.0, threshold=40.0,
                           prefix_len=2)


def _q_canopy(sf_dir: str):
    """Canopy blocking over distinct part names: token-set Jaccard,
    loose 0.34 / tight 0.75, ascending-name center order."""
    import ray.data

    from record_matcher_ray.pipelines.linkage import canopy_clusters

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_name"]
    )
    return canopy_clusters(ds, "p_name", t_loose=0.34, t_tight=0.75)


def _q_match_1to1(sf_dir: str):
    """One-to-one assignment over the prefix-blocked Jaro-Winkler pair
    stream: local-max (mutual-best) rounds, each part name matched at
    most once."""
    import ray.data

    from record_matcher_ray.pipelines.linkage import (
        greedy_max_matching,
        jw_prefix_join,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_name"]
    )
    pairs = jw_prefix_join(ds, "p_name", threshold=75.0, prefix_len=2)
    return greedy_max_matching(pairs, "name_a", "name_b", "jw_sim",
                               rounds=3)


def _match_1to1_oracle(rounds: int = 3) -> str:
    """Replay of linkage.greedy_max_matching over the jw_prefix_part
    pair stream: per round, nominations via row_number (score desc,
    partner asc), mutual edges matched, touched nodes filtered."""
    sql = ["""
        WITH v AS (
          SELECT DISTINCT p_name AS name FROM part
          WHERE length(p_name) >= 2
        ), e0 AS (
          SELECT * FROM (
            SELECT a.name AS name_a, b.name AS name_b,
                   round(100.0 * jaro_winkler_similarity(a.name, b.name),
                         6) AS jw_sim
            FROM v a JOIN v b
              ON substr(a.name, 1, 2) = substr(b.name, 1, 2)
             AND a.name < b.name
          ) WHERE jw_sim >= (75.0)::DOUBLE
        )"""]
    for i in range(1, rounds + 1):
        sql.append(f""",
        n{i} AS (
          SELECT name_a, name_b, jw_sim FROM (
            SELECT name_a, name_b, jw_sim,
                   row_number() OVER (
                     PARTITION BY node
                     ORDER BY jw_sim DESC, other ASC
                   ) AS rn
            FROM (
              SELECT name_a AS node, name_b AS other,
                     name_a, name_b, jw_sim FROM e{i - 1}
              UNION ALL
              SELECT name_b AS node, name_a AS other,
                     name_a, name_b, jw_sim FROM e{i - 1}
            )
          ) WHERE rn = 1
        ),
        m{i} AS (
          SELECT name_a, name_b, min(jw_sim) AS jw_sim,
                 ({i})::BIGINT AS rnd
          FROM n{i} GROUP BY name_a, name_b HAVING count(*) = 2
        ),
        t{i} AS (
          SELECT name_a AS nd FROM m{i}
          UNION ALL SELECT name_b FROM m{i}
        ),
        e{i} AS (
          SELECT * FROM e{i - 1}
          WHERE name_a NOT IN (SELECT nd FROM t{i})
            AND name_b NOT IN (SELECT nd FROM t{i})
        )""")
    union = "\n          UNION ALL ".join(
        f"SELECT name_a, name_b, jw_sim, rnd FROM m{i}"
        for i in range(1, rounds + 1)
    )
    sql.append(f"""
        {union}
    """)
    return "".join(sql)


def _q_labelprop(sf_dir: str):
    """Deterministic synchronous label propagation (4 rounds, min-label
    ties) over the bidirectional part<->supplier graph of lineitem."""
    import pyarrow as pa

    import ray.data

    from record_matcher_ray.pipelines.graph import label_propagation

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def edges(t: pa.Table) -> pa.Table:
        p = t["l_partkey"].to_numpy().astype(np.int64)
        s = t["l_suppkey"].to_numpy().astype(np.int64) + _PR_OFF
        return pa.table(
            {"src": pa.array(np.concatenate([p, s])),
             "dst": pa.array(np.concatenate([s, p]))}
        )

    return label_propagation(
        li.map_batches(edges, batch_format="pyarrow"), iters=4
    )


def _labelprop_oracle(iters: int = 4) -> str:
    """Replay of pipelines/graph.label_propagation: one chained CTE per
    round; most-frequent in-neighbor label with min-label ties via
    row_number; integer-exact throughout."""
    sql = [f"""
        WITH edges AS (
          SELECT l_partkey::BIGINT AS src,
                 l_suppkey::BIGINT + {_PR_OFF} AS dst
          FROM lineitem
          UNION ALL
          SELECT l_suppkey::BIGINT + {_PR_OFF} AS src,
                 l_partkey::BIGINT AS dst
          FROM lineitem
        ), nodes AS (
          SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION ALL SELECT dst FROM edges)
        ), lab0 AS (
          SELECT node, node AS lab FROM nodes
        )"""]
    for i in range(1, iters + 1):
        sql.append(f""",
        lab{i} AS (
          SELECT nd.node, coalesce(w.lab, p.lab) AS lab
          FROM nodes nd
          JOIN lab{i - 1} p ON p.node = nd.node
          LEFT JOIN (
            SELECT dst AS node, lab FROM (
              SELECT e.dst, l.lab,
                     row_number() OVER (
                       PARTITION BY e.dst
                       ORDER BY count(*) DESC, l.lab ASC
                     ) AS rn
              FROM edges e JOIN lab{i - 1} l ON l.node = e.src
              GROUP BY e.dst, l.lab
            ) q WHERE rn = 1
          ) w ON w.node = nd.node
        )""")
    sql.append(f"""
        SELECT node, lab AS label FROM lab{iters}
    """)
    return "".join(sql)


def _q_chao1(sf_dir: str):
    """Chao1 unseen-vocabulary estimate from exact term counts."""
    import ray.data

    from record_matcher_ray.pipelines.terms import chao1_vocab

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return chao1_vocab(ds)


def _q_heaps(sf_dir: str):
    """Heaps'-law vocabulary-growth curve: per doc (ascending doc_id),
    new terms introduced, token count, running vocab/token totals."""
    import ray.data

    from record_matcher_ray.pipelines.terms import heaps_curve

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return heaps_curve(ds)


def _q_adamic_adar(sf_dir: str):
    """Adamic-Adar link-prediction affinity between parts sharing
    orders (weight 1/ln(basket size), support >= 2)."""
    import ray.data

    from record_matcher_ray.pipelines.itemsets import adamic_adar_items

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return adamic_adar_items(ds, "l_orderkey", "l_partkey",
                             min_support=2, max_basket=256)


def _q_dedup_keep_best(sf_dir: str):
    """Keep-best exact dedup: group docs by NORMALIZED text (NFC,
    lower, collapsed whitespace), keeper = longest original (tie: min
    doc_id); full (doc_id, keeper_id) assignment."""
    import ray.data

    from record_matcher_ray.pipelines.analysis import normalize_text
    from record_matcher_ray.pipelines.dedup import exact_dedup_keep_best

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "n_chars"],
    )
    return exact_dedup_keep_best(
        normalize_text(ds), ["text"], "doc_id", "n_chars", emit_all=True
    )


def _q_zipf(sf_dir: str):
    """Zipf's-law OLS fit (ln freq ~ ln rank) over the corpus's
    top-128 terms."""
    import ray.data

    from record_matcher_ray.pipelines.terms import zipf_fit

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return zipf_fit(ds, k=128)


def _q_benford(sf_dir: str):
    """Benford first-digit χ² forensics of order amounts per priority
    class (exact integer digit counts, pinned double χ² fold)."""
    import ray.data

    from record_matcher_ray.pipelines.stats import benford_digit_test

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
    )
    return benford_digit_test(ds, "o_totalprice", "o_orderpriority")


def _q_davies_bouldin(sf_dir: str):
    """Clustering-quality eval: Davies-Bouldin (RMS form) over the
    fixed-point kmeans clusters of the embeddings table."""
    import ray.data

    from record_matcher_ray.pipelines.similarity import davies_bouldin

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return davies_bouldin(ds, k=8, iters=5)


def _q_merge_report(sf_dir: str):
    """Survivorship audit: same edjoin->CC clusters as
    golden_record_part, reporting per-cluster distinct-value conflicts
    in (brand, size, retailprice)."""
    import ray.data

    from record_matcher_ray.pipelines.cluster import connected_components
    from record_matcher_ray.pipelines.joins import hash_join
    from record_matcher_ray.pipelines.linkage import (
        edit_distance_self_join,
        merge_conflict_report,
    )

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_brand", "p_retailprice",
                 "p_size"],
    )
    pairs = edit_distance_self_join(
        part.select_columns(["p_partkey", "p_name"]),
        "p_name", "p_partkey", max_dist=1, q=2,
    )

    def as_edges(t):
        import pyarrow as pa

        return pa.table({"u": t["x_id"], "v": t["y_id"]})

    cc = connected_components(
        pairs.map_batches(as_edges, batch_format="pyarrow"), "u", "v"
    )
    lab = hash_join(part, cc, "p_partkey", "node", how="left")

    def fill(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        comp = pc.coalesce(
            pc.cast(t["component"], pa.int64()),
            pc.cast(t["p_partkey"], pa.int64()),
        )
        return t.drop_columns(["component"]).append_column("cluster", comp)

    lab = lab.map_batches(fill, batch_format="pyarrow")
    return merge_conflict_report(
        lab, "cluster", ["p_brand", "p_size", "p_retailprice"]
    )


def _q_monge_elkan(sf_dir: str):
    """Monge-Elkan hybrid token-level fuzzy join over brand-blocked
    part names (symmetric mean of per-token best Jaro-Winkler)."""
    import ray.data

    from record_matcher_ray.pipelines.linkage import monge_elkan_join

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_name"],
    )
    return monge_elkan_join(
        ds, "p_name", "p_partkey", "p_brand", threshold=90.0
    )


def _q_fs_tf(sf_dir: str):
    """TF-adjusted Fellegi-Sunter (Splink-style tf_adjustments): rare-
    value agreements outscore common ones via per-value u = (c_v/N)^2;
    same blocking/fields/thresholds as fs_score_customer."""
    import ray.data

    from record_matcher_ray.pipelines.linkage import fellegi_sunter_link_tf

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet")

    def add_band(t):
        import numpy as np
        import pyarrow as pa

        b = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) / 100.0
        ).astype(np.int64)
        return t.append_column("band", pa.array(b))

    return fellegi_sunter_link_tf(
        ds.map_batches(add_band, batch_format="pyarrow"),
        "c_custkey", "c_nationkey", ["c_mktsegment", "band"],
        t_upper=4.0, t_lower=0.0,
    )


def _q_hybrid_search(sf_dir: str):
    """Hybrid retrieval: BM25 lexical top-20 fused with the exact
    quantized-cosine top-20 neighbors of doc 0's embedding via
    Reciprocal Rank Fusion (k=60) — the classic two-leg search stack."""
    import ray.data

    from record_matcher_ray.pipelines.similarity import (
        exact_cosine_topk,
        rrf_fuse,
    )
    from record_matcher_ray.pipelines.terms import bm25_topk

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    lex = bm25_topk(docs, "merge scan vector window", k=20).to_pandas()
    lex = lex.rename(columns={"doc_id": "id"})
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    sem = exact_cosine_topk(emb, query_id=0, k=20)
    return rrf_fuse([lex, sem], k=60)


def _q_top_terms_by_source(sf_dir: str):
    """Per-source top-10 terms (vocabulary census per shard)."""
    import ray.data

    from record_matcher_ray.pipelines.terms import top_terms_by_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return top_terms_by_group(ds, "source", k=10)


def _q_term_kl(sf_dir: str):
    """Per-source term-distribution KL divergence vs the corpus blend
    (mixture drift monitoring)."""
    import ray.data

    from record_matcher_ray.pipelines.terms import term_kl_divergence

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return term_kl_divergence(ds, "source")


def _q_q3_shipping(sf_dir: str):
    """TPC-H Q3 shape (3-table join + filtered aggregate + top-k):
    unshipped-revenue per order for BUILDING customers — semi-join
    broadcast on the customer side, bucketed hash join on orderkey,
    exact integer cent·(100−disc) revenue units, top 10."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from record_matcher_ray.pipelines.joins import hash_join, semi_join

    CUT = 899164800000000  # 1998-06-30 00:00:00 in microseconds

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
    ).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")),
        batch_format="pyarrow",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
    )

    def ord_prep(t: pa.Table) -> pa.Table:
        dt = pc.cast(t["o_orderdate"], pa.int64())
        keep = pc.less(dt, CUT)
        sub = t.filter(keep)
        return pa.table(
            {"o_orderkey": sub["o_orderkey"],
             "o_custkey": sub["o_custkey"],
             "o_date_us": pc.cast(sub["o_orderdate"], pa.int64()),
             "o_orderpriority": sub["o_orderpriority"]}
        )

    orders_f = semi_join(
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        cust, "o_custkey", key_col="c_custkey",
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
    )

    def li_units(t: pa.Table) -> pa.Table:
        import numpy as np

        dt = pc.cast(t["l_shipdate"], pa.int64())
        sub = t.filter(pc.greater(dt, CUT))
        cents = np.floor(
            sub["l_extendedprice"].to_numpy(zero_copy_only=False)
            * 100.0 + 0.5
        ).astype(np.int64)
        disc = np.floor(
            sub["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        t2 = pa.table(
            {"l_orderkey": sub["l_orderkey"],
             "units": pa.array(cents * (100 - disc))}
        )
        # partial pre-aggregation per orderkey inside the batch
        return t2.group_by(["l_orderkey"]).aggregate([("units", "sum")]) \
            .rename_columns(["l_orderkey", "units"])

    li_p = li.map_batches(li_units, batch_format="pyarrow")
    joined = hash_join(li_p, orders_f, "l_orderkey", "o_orderkey")
    agg = joined.groupby(
        ["l_orderkey", "o_date_us", "o_orderpriority"]
    ).aggregate(Sum("units", alias_name="units"))

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np

        rev = t["units"].to_numpy().astype(np.float64) / 10000.0
        rev = np.floor(rev * 100.0 + 0.5) / 100.0
        return pa.table(
            {"o_orderkey": t["l_orderkey"],
             "o_date_us": t["o_date_us"],
             "o_orderpriority": t["o_orderpriority"],
             "revenue": pa.array(rev)}
        )

    return (
        agg.map_batches(finish, batch_format="pyarrow")
        .sort(["revenue", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


def _q_q5_star(sf_dir: str):
    """TPC-H Q5 shape (star join with a cross-dimension equality):
    1996 revenue by ASIA nation where supplier and customer share the
    nation — bucketed fact joins, broadcast dimension lookups, exact
    integer revenue units."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from record_matcher_ray.pipelines.joins import (
        broadcast_lookup,
        hash_join,
    )

    LO = 820454400000000   # 1996-01-01 UTC micros
    HI = 852076800000000   # 1997-01-01 UTC micros

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def ord_prep(t: pa.Table) -> pa.Table:
        dt = pc.cast(t["o_orderdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(dt, LO), pc.less(dt, HI))
        sub = t.filter(keep)
        return pa.table({"o_orderkey": sub["o_orderkey"],
                         "o_custkey": sub["o_custkey"]})

    orders_f = orders.map_batches(ord_prep, batch_format="pyarrow")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    )

    def li_units(t: pa.Table) -> pa.Table:
        import numpy as np

        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * 100.0 + 0.5
        ).astype(np.int64)
        disc = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "l_suppkey": t["l_suppkey"],
             "units": pa.array(cents * (100 - disc))}
        )

    fact = hash_join(
        li.map_batches(li_units, batch_format="pyarrow"),
        orders_f, "l_orderkey", "o_orderkey",
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
    )
    fact = hash_join(fact, cust, "o_custkey", "c_custkey")
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
    )
    fact = broadcast_lookup(fact, supp, "l_suppkey", "s_suppkey",
                            how="inner")
    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet")
    region = ray.data.read_parquet(f"{sf_dir}/region.parquet")
    nr = broadcast_lookup(nation, region, "n_regionkey", "r_regionkey",
                          how="inner")
    fact = broadcast_lookup(
        fact, nr, "c_nationkey", "n_nationkey", how="inner",
        columns=["n_nationkey", "n_name", "r_name"],
    )

    def local_filter(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t["r_name"], "ASIA"),
            pc.equal(pc.cast(t["c_nationkey"], pa.int64()),
                     pc.cast(t["s_nationkey"], pa.int64())),
        )
        sub = t.filter(keep)
        return pa.table({"n_name": sub["n_name"], "units": sub["units"]})

    agg = (
        fact.map_batches(local_filter, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("units", alias_name="units"))
    )

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np

        rev = t["units"].to_numpy().astype(np.float64) / 10000.0
        rev = np.floor(rev * 100.0 + 0.5) / 100.0
        return pa.table({"n_name": t["n_name"],
                         "revenue": pa.array(rev)})

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_linkage_eval(sf_dir: str):
    """Pairwise P/R/F1 of the Fellegi-Sunter linker (t_upper=2.0, so
    band-agreement alone clears the bar) against same-(nation, segment)
    truth pairs — the BASELINE.md pairwise-F1 readout as an operator."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from record_matcher_ray.pipelines.linkage import (
        fellegi_sunter_link,
        pairwise_eval,
    )

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet")

    def add_band(t):
        import numpy as np

        b = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) / 100.0
        ).astype(np.int64)
        return t.append_column("band", pa.array(b))

    banded = ds.map_batches(add_band, batch_format="pyarrow")
    scored = fellegi_sunter_link(
        banded, "c_custkey", "c_nationkey", ["c_mktsegment", "band"],
        t_upper=2.0, t_lower=0.0,
    )

    def match_pairs(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t["decision"], "match"))
        return pa.table({"a": sub["x_id"], "b": sub["y_id"]})

    pred = scored.map_batches(match_pairs, batch_format="pyarrow")

    # truth: same (nation, segment) pairs via the exact-equality join
    def add_key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["c_nationkey"], pa.string()),
            pc.cast(t["c_mktsegment"], pa.string()), "|",
        )
        return pa.table({"c_custkey": t["c_custkey"], "key": key})

    from record_matcher_ray.pipelines.linkage import (
        edit_distance_self_join,
    )

    truth = edit_distance_self_join(
        ds.map_batches(add_key, batch_format="pyarrow"),
        "key", "c_custkey", max_dist=0,
    ).map_batches(
        lambda t: pa.table({"a": t["x_id"], "b": t["y_id"]}),
        batch_format="pyarrow",
    )
    return pairwise_eval(pred, truth)


def _q_tfidf_pairs(sf_dir: str):
    """Sparse TF-IDF cosine similarity join over documents: all pairs
    with cosine >= 0.5 in the df<=100-pruned term space (term-at-a-time
    exchange, exact integer dots)."""
    import ray.data

    from record_matcher_ray.pipelines.terms import tfidf_cosine_pairs

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return tfidf_cosine_pairs(ds, threshold=0.5, max_df=100)


def _q_dbscan(sf_dir: str):
    """DBSCAN under cosine over the embeddings table (exact bounded
    variant): eps-sim 0.35, min_pts 3, canonical min-core-id labels."""
    import ray.data

    from record_matcher_ray.pipelines.similarity import dbscan_embeddings

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return dbscan_embeddings(ds, eps_sim=0.35, min_pts=3)


def _q_em_fs(sf_dir: str):
    """Unsupervised Fellegi-Sunter parameter estimation (Winkler/Splink
    EM) over nation-blocked customer pairs: agreement-pattern counts on
    (mktsegment, acctbal-band-100) -> 15 EM iterations -> per-pattern
    match posterior."""
    import ray.data

    from record_matcher_ray.pipelines.linkage import em_fellegi_sunter

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet")

    def add_band(t):
        import numpy as np
        import pyarrow as pa

        b = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) / 100.0
        ).astype(np.int64)
        return t.append_column("band", pa.array(b))

    return em_fellegi_sunter(
        ds.map_batches(add_band, batch_format="pyarrow"),
        "c_custkey",
        "c_nationkey",
        ["c_mktsegment", "band"],
        n_iter=15,
    )


def _em_fs_oracle(n_iter: int = 15) -> str:
    """Chained-CTE DuckDB replay of em_fellegi_sunter on customer
    (fields f1=mktsegment, f2=acctbal-band-100, block=nation): pattern
    counts from the block self-join, then every EM iteration as one
    (r{i}, s{i}, it{i}) CTE triple — per-pattern likelihoods as the
    SAME left-nested products, sums as ascending-pattern list_reduce
    folds, identical clamps. Pinned-order IEEE doubles both sides."""
    k = 2
    ONE = "(1.0)::DOUBLE"

    def am_expr(it: str, kind: str) -> str:
        lead = f"{it}.lam" if kind == "m" else f"({ONE} - {it}.lam)"
        e = lead
        for f in range(1, k + 1):
            p = f"{it}.{kind}{f}"
            e = (f"({e} * CASE WHEN (pattern & {1 << (f - 1)}) = "
                 f"{1 << (f - 1)} THEN {p} ELSE {ONE} - {p} END)")
        return e

    fold = "(x, y) -> x + y"
    r_term = "(c)::DOUBLE * (am / (am + au))"
    t_term = f"(c)::DOUBLE * ({ONE} - am / (am + au))"
    parts = [f"""
        WITH f AS (
          SELECT c_custkey AS id, c_nationkey AS blk,
                 c_mktsegment AS f1,
                 CAST(floor(c_acctbal / (100.0)::DOUBLE) AS BIGINT) AS f2
          FROM customer
        ), pcn AS (
          SELECT (CASE WHEN a.f1 IS NOT NULL AND a.f1 = b.f1
                       THEN 1 ELSE 0 END)
               + (CASE WHEN a.f2 IS NOT NULL AND a.f2 = b.f2
                       THEN 2 ELSE 0 END) AS pattern,
                 count(*)::BIGINT AS c
          FROM f a JOIN f b ON a.blk = b.blk AND a.id < b.id
          GROUP BY 1
        ), nt AS (SELECT (sum(c))::DOUBLE AS n FROM pcn),
        it0 AS (
          SELECT (0.1)::DOUBLE AS lam,
                 (0.9)::DOUBLE AS m1, (0.9)::DOUBLE AS m2,
                 (0.1)::DOUBLE AS u1, (0.1)::DOUBLE AS u2
        )"""]
    clamp = (lambda x: f"least(greatest({x}, (1e-9)::DOUBLE), "
                       f"{ONE} - (1e-9)::DOUBLE)")
    for i in range(1, n_iter + 1):
        p = f"it{i - 1}"
        sm_cols = []
        upd_cols = []
        for f in range(1, k + 1):
            bit = 1 << (f - 1)
            case_m = (f"CASE WHEN (pattern & {bit}) = {bit} "
                      f"THEN {r_term} ELSE (0.0)::DOUBLE END")
            case_u = (f"CASE WHEN (pattern & {bit}) = {bit} "
                      f"THEN {t_term} ELSE (0.0)::DOUBLE END")
            sm_cols.append(
                f"list_reduce(list({case_m} ORDER BY pattern), {fold})"
                f" AS sm{f},\n            "
                f"list_reduce(list({case_u} ORDER BY pattern), {fold})"
                f" AS su{f}"
            )
            upd_cols.append(
                f"{clamp(f's.sm{f} / s.S')} AS m{f},\n            "
                f"{clamp(f's.su{f} / s.T')} AS u{f}"
            )
        parts.append(f""", r{i} AS (
          SELECT pattern, c,
                 {am_expr(p, 'm')} AS am,
                 {am_expr(p, 'u')} AS au
          FROM pcn, {p}
        ), s{i} AS (
          SELECT
            list_reduce(list({r_term} ORDER BY pattern), {fold}) AS S,
            list_reduce(list({t_term} ORDER BY pattern), {fold}) AS T,
            {','.join(sm_cols)}
          FROM r{i}
        ), it{i} AS (
          SELECT {clamp('s.S / nt.n')} AS lam,
            {','.join(upd_cols)}
          FROM s{i} s, nt
        )""")
    parts.append(f""", fin AS (
          SELECT pattern, c,
                 {am_expr(f'it{n_iter}', 'm')} AS am,
                 {am_expr(f'it{n_iter}', 'u')} AS au
          FROM pcn, it{n_iter}
        )
        SELECT (pattern)::BIGINT AS pattern, c AS n_pairs,
               floor((am / (am + au)) * 1000000000.0 + 0.5)
                 / 1000000000.0 AS posterior
        FROM fin""")
    return "".join(parts)


def _q_chunk_dedup(sf_dir: str):
    """Paragraph/chunk-level exact dedup (composition): token-window
    chunking (size 32, no overlap) -> exact duplicate groups over
    chunk_text — the passage-granularity dedup a pretraining pipeline
    runs between document-level exact and minhash near-dup passes."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from record_matcher_ray.pipelines.chunking import chunk_documents
    from record_matcher_ray.pipelines.dedup import exact_dup_groups

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ch = chunk_documents(ds, size=32, overlap=0)

    def add_cid(t: pa.Table) -> pa.Table:
        cid = pc.add(
            pc.multiply(pc.cast(t["doc_id"], pa.int64()), 1_000_000),
            pc.cast(t["chunk_id"], pa.int64()),
        )
        return t.append_column("cid", cid)

    ch2 = ch.map_batches(add_cid, batch_format="pyarrow")
    return exact_dup_groups(ch2, ["chunk_text"], "cid")


def _q_item_cosine(sf_dir: str):
    """Item-item affinity (cosine + lift over exact basket supports):
    parts co-ordered in >= 3 orders."""
    import ray.data

    from record_matcher_ray.pipelines.itemsets import (
        item_cooccurrence_similarity,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return item_cooccurrence_similarity(
        ds, "l_orderkey", "l_partkey", min_support=3
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from record_matcher_ray.pipelines import analysis, relational

    def token_counts(sf_dir):
        import ray.data

        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return analysis.token_counts(ds)

    def quality(sf_dir):
        import ray.data

        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return analysis.quality_scores(ds)

    return {
        # relational / aggregate / stream shapes
        "lineitem_agg": relational.lineitem_agg,
        "customer_topk": relational.customer_nation_topk,
        "orders_by_status": relational.orders_by_status,
        "events_window": relational.events_tumbling_window,
        "topk_per_group": relational.topk_per_group,
        "sessionize_events": relational.sessionize_events,
        "last_error_asof": relational.last_error_asof,
        "events_sliding_window": relational.events_sliding_window,
        "building_orders_semi": relational.building_orders_semi,
        "events_props_extract": relational.events_props_extract,
        # reference records-utility operators (O2, O4, O5)
        "uniqueness_customer": _q_uniqueness_customer,
        "group_by_segment": _q_group_by_segment,
        "duplicated_orders": _q_duplicated_orders,
        # match pipeline (O6-O8) + scorer kernel surface
        "match_exact_customer": _match_exact_customer,
        "supplier_levenshtein": relational.supplier_nation_levenshtein,
        "supplier_jaro": relational.supplier_nation_jaro,
        # joins
        "orders_customer_full": _q_orders_customer_full,
        "orders_anti_building": _q_orders_anti_building,
        "building_orders_bloom": _q_building_orders_bloom,
        "pagerank_lineitem": _q_pagerank,
        "snapshot_diff_docs": _q_snapshot_diff,
        "connected_components_docs": _q_connected_components,
        "linear_fit_lineitem": _q_linear_fit,
        # dedup family
        "dedup_exact_docs": _q_dedup_exact_docs,
        "dup_span_stats_docs": _q_dup_span_stats,
        "dup_spans_docs": _q_dup_spans,
        "strip_spans_docs": _q_strip_spans,
        "minhash_dedup_docs": _q_minhash_dedup,
        "minhash_signatures_docs": _q_minhash_signatures,
        "minhash_recall_docs": _q_minhash_recall,
        "ngram_jaccard_docs": _q_ngram_jaccard,
        "simhash_docs": _q_simhash,
        "simhash_near_dups_docs": _q_simhash_near_dups,
        # decontamination + deterministic sampling / mixing
        "decontam_docs": _q_decontam,
        "sample_docs": _q_sample_docs,
        "weighted_sample_docs": _q_weighted_sample,
        "shuffle_docs": _q_shuffle_docs,
        "stratified_docs": _q_stratified_docs,
        "mix_docs": _q_mix_docs,
        "pack_docs": _q_pack_docs,
        # similarity search
        "ann_topk": _q_ann_topk,
        "lsh_topk": _q_lsh_topk,
        "embedding_near_dups": _q_embedding_near_dups,
        "kmeans_embeddings": _q_kmeans,
        "semantic_decontam_embeddings": _q_semantic_decontam,
        # text analysis
        "token_count_docs": token_counts,
        "quality_docs": quality,
        "lm_quality_docs": _q_lm_quality,
        "lang_id_docs": _q_lang_id,
        "fingerprint_docs": _q_fingerprints,
        "repetition_docs": _q_repetition,
        "pii_docs": _q_pii,
        "quantiles_orders": _q_quantiles,
        "approx_quantiles_orders": _q_approx_quantiles,
        "latest_order_per_customer": _q_latest_order,
        "approx_distinct_orders": _q_approx_distinct,
        "kmv_orders": _q_kmv,
        "kmv_setops_orders": _q_kmv_setops,
        "welch_orders": _q_welch,
        "gini_orders": _q_gini,
        "theil_orders": _q_theil,
        "ppr_lineitem": _q_ppr,
        "interval_union_events": _q_interval_union,
        "attribution_events": _q_attribution,
        "attribution_first_events": _q_attribution_first,
        "countmin_orders": _q_countmin,
        "quantile_filter_docs": _q_quantile_filter,
        "winsorize_docs": _q_winsorize,
        "split_docs": _q_split_docs,
        "events_in_order_window": _q_events_in_window,
        "redact_docs": _q_redact,
        "chunk_docs": _q_chunks,
        "top_terms_docs": _q_top_terms,
        "hashed_tfidf_docs": _q_hashed_tfidf,
        "inverted_index_docs": _q_inverted_index,
        "bm25_docs": _q_bm25,
        "decontam_near_docs": _q_decontam_near,
        "minhash_decontam_docs": _q_minhash_decontam,
        "contamination_docs": _q_containment,
        "compression_docs": _q_compression,
        "bm25_topk_docs": _q_bm25_topk,
        "funnel_events": _q_funnel,
        "retention_events": _q_retention,
        "rolling_mean_events": _q_rolling_mean,
        "interarrival_events": _q_interarrival,
        "transitions_events": _q_transitions,
        "rollup_orders": _q_rollup,
        "pmi_cooccurrence_docs": _q_pmi,
        "pca_embeddings": _q_pca,
        "zscore_events": _q_zscore,
        "profile_orders": _q_profile,
        "distinct_users_by_type": _q_distinct_by,
        "histogram_orders": _q_histogram,
        "ntile_orders": _q_ntile,
        "intervals_events": _q_intervals,
        "pivot_orders": _q_pivot,
        "twap_events": _q_twap,
        "normalize_docs": _q_normalize_text,
        "blocklist_docs": _q_blocklist,
        "char_entropy_docs": _q_char_entropy,
        "triangles_orders": _q_triangles,
        "resample_events": _q_resample,
        "robust_z_events": _q_robust_z,
        "running_total_events": _q_running_total,
        "pct_rank_orders": _q_pct_rank,
        "mode_orders": _q_mode,
        "rolling_active_events": _q_rolling_active,
        "script_profile_docs": _q_script_profile,
        "row_number_orders": _q_row_number,
        "seq_pattern_events": _q_seq_pattern,
        "snm_pairs_customer": _q_snm_pairs,
        "soundex_part": _q_soundex,
        "edjoin_part": _q_edjoin,
        "fs_score_customer": _q_fellegi_sunter,
        "metablock_part": _q_metablock,
        "mutual_nn_embeddings": _q_mutual_nn,
        "heavy_hitters_orders": _q_heavy_hitters,
        "corr_lineitem": _q_grouped_corr,
        "glm_lineitem": _q_grouped_linear_fit,
        "weighted_topk_docs": _q_weighted_topk,
        "basket_pairs_lineitem": _q_basket_pairs,
        "item_cosine_lineitem": _q_item_cosine,
        "chunk_dedup_docs": _q_chunk_dedup,
        "em_fs_customer": _q_em_fs,
        "dbscan_embeddings": _q_dbscan,
        "tfidf_pairs_docs": _q_tfidf_pairs,
        "linkage_eval_customer": _q_linkage_eval,
        "q3_shipping": _q_q3_shipping,
        "q5_region_revenue": _q_q5_star,
        "top_terms_by_source": _q_top_terms_by_source,
        "term_kl_docs": _q_term_kl,
        "hybrid_search_docs": _q_hybrid_search,
        "fs_tf_customer": _q_fs_tf,
        "monge_elkan_part": _q_monge_elkan,
        "merge_report_part": _q_merge_report,
        "davies_bouldin_embeddings": _q_davies_bouldin,
        "psi_orders": _q_psi,
        "ewma_events": _q_ewma,
        "cusum_events": _q_cusum,
        "zipf_docs": _q_zipf,
        "dedup_keep_best_docs": _q_dedup_keep_best,
        "adamic_adar_lineitem": _q_adamic_adar,
        "heaps_docs": _q_heaps,
        "chao1_docs": _q_chao1,
        "labelprop_lineitem": _q_labelprop,
        "match_1to1_part": _q_match_1to1,
        "canopy_part": _q_canopy,
        "soft_tfidf_part": _q_soft_tfidf,
        "benford_orders": _q_benford,
        "band_join_orders": _q_band_join,
        "golden_record_part": _q_golden_record,
        "blocking_quality_part": _q_blocking_quality,
        "next_purchase_asof": _q_next_purchase,
        "entropy_customer_segments": _q_grouped_entropy,
        "token_sort_part": _q_token_sort,
        "bfs_hops_lineitem": _q_bfs_hops,
        "compare_vectors_customer": _q_compare_vectors,
        "window_dedupe_events": _q_window_dedupe,
        "jw_prefix_part": _q_jw_prefix,
        "cube_orders": _q_cube,
        "er_pipeline_customer": _q_er_pipeline,
        "pareto_orders": _q_pareto,
        "explode_embeddings": _q_explode,
        "centroid_cosine_embeddings": _q_centroid_cosine,
        # north-star document pipeline + multimodal plumbing
        "docmatch_corpus": _q_docmatch,
        "media_features": _q_media_features,
        "media_frames": _q_media_frames,
        "media_real": _q_media_real,
    }


def _blocklist_oracle() -> str:
    """Blocklist replay: one `contains` term per phrase (lowercased both
    sides, same as the engine's case_insensitive=True path)."""
    terms = " + ".join(
        "CASE WHEN contains(lower(coalesce(text, '')), '"
        + p.lower().replace("'", "''")
        + "') THEN 1 ELSE 0 END"
        for p in _BLOCKLIST
    )
    return f"""
        SELECT doc_id, text, ({terms})::BIGINT AS n_hits,
               ({terms}) = 0 AS keep
        FROM documents
    """


def _split_docs_oracle() -> str:
    """Leakage-safe split replay: rep = min(doc_id) per identical text,
    splitmix64(rep ^ seed) banded by the ENGINE's own integer thresholds
    (embedded as literals — no float surface)."""
    from record_matcher_ray.pipelines.sampling import (
        split_thresholds,
        sql_sample_hash_cte,
    )

    bands = split_thresholds(_SPLIT_WEIGHTS)
    cte, hcol = sql_sample_hash_cte("rep", seed=11)
    case = " ".join(
        f"WHEN {hcol} < CAST({thr} AS UBIGINT) THEN '{name}'"
        for name, thr in bands[:-1]
    )
    return f"""
        WITH r AS (
          SELECT doc_id,
                 min(doc_id) OVER (PARTITION BY text) AS rep
          FROM documents
        ), t0 AS (SELECT doc_id, rep FROM r),{cte}
        SELECT doc_id, rep,
               CASE {case} ELSE '{bands[-1][0]}' END AS split
        FROM s5
    """


def _sampling_oracles() -> dict[str, str]:
    """Hash-exact SQL mirrors of the sampling family: the engine's
    splitmix64 sampling hash is replayed in DuckDB (32-bit-split modular
    multiplication), and the keep-thresholds are computed by the SAME
    Python expression the engine uses, so predicates agree bit-exactly."""
    from record_matcher_ray.pipelines.sampling import sql_sample_hash_cte

    two64 = 1 << 64

    def thr(rate: float) -> int:
        return min(int(rate * two64), two64 - 1)

    cte2, _ = sql_sample_hash_cte("doc_id", seed=2)
    cte42, _ = sql_sample_hash_cte("doc_id", seed=42)
    cte7, _ = sql_sample_hash_cte("doc_id", seed=7)
    cte3, _ = sql_sample_hash_cte("doc_id", seed=3)
    cte13, _ = sql_sample_hash_cte("doc_id", seed=13)
    return {
        "weighted_sample_docs": f"""
            WITH t0 AS (SELECT doc_id, source, n_chars FROM documents),{cte13}
            SELECT doc_id, source, n_chars FROM s5
            WHERE (e)::HUGEINT * 800
                  < (least(greatest(n_chars, 0), 800))::HUGEINT
                    * 18446744073709551616::HUGEINT
        """,
        "weighted_topk_docs": f"""
            WITH t0 AS (
              SELECT doc_id, (n_chars)::DOUBLE AS w FROM documents
              WHERE n_chars IS NOT NULL AND (n_chars)::DOUBLE > 0.0
            ),{cte2}
            SELECT (doc_id)::BIGINT AS id, w,
                   floor((-ln(((e >> 11)::DOUBLE + 1.0)
                              / 9007199254740992.0) / w)
                         * 1000000000.0 + 0.5) / 1000000000.0 AS key
            FROM s5
            ORDER BY -ln(((e >> 11)::DOUBLE + 1.0)
                         / 9007199254740992.0) / w,
                     doc_id
            LIMIT 50
        """,
        "sample_docs": f"""
            WITH t0 AS (SELECT doc_id, source, n_chars FROM documents),{cte42}
            SELECT doc_id, source, n_chars FROM s5
            WHERE e < CAST({thr(0.1)} AS UBIGINT)
        """,
        "stratified_docs": f"""
            WITH t0 AS (SELECT doc_id, lang FROM documents),{cte7}
            SELECT doc_id, lang FROM s5
            QUALIFY row_number() OVER (PARTITION BY lang ORDER BY e, doc_id)
                    <= 20
        """,
        "mix_docs": f"""
            WITH t0 AS (SELECT doc_id, source FROM documents),{cte3}
            SELECT doc_id, source FROM s5
            WHERE e < CAST(CASE source
                           WHEN 'src0' THEN {thr(1.0)}
                           WHEN 'src1' THEN {thr(0.5)}
                           WHEN 'src2' THEN {thr(0.25)}
                           ELSE {thr(0.1)} END AS UBIGINT)
        """,
        "shuffle_docs": f"""
            WITH t0 AS (SELECT doc_id FROM documents),{cte7}
            SELECT (row_number() OVER (ORDER BY e, doc_id) - 1)::BIGINT
                     AS pos,
                   doc_id
            FROM s5 ORDER BY e, doc_id LIMIT 100
        """,
        "split_docs": _split_docs_oracle(),
    }


def _pii_oracles() -> dict[str, str]:
    """PII oracles built from the ENGINE's pattern dict so the SQL mirror
    can never drift from the code (both sides are RE2)."""
    from record_matcher_ray.pipelines.pii import PII_PATTERNS

    counts = ",\n                   ".join(
        f"len(regexp_extract_all(coalesce(text, ''), '{p}'))::BIGINT AS n_{k}"
        for k, p in PII_PATTERNS.items()
    )
    total = " + ".join(
        f"len(regexp_extract_all(coalesce(text, ''), '{p}'))"
        for p in PII_PATTERNS.values()
    )
    redacted = "coalesce(text, '')"
    for p in PII_PATTERNS.values():
        redacted = f"regexp_replace({redacted}, '{p}', '[PII]', 'g')"
    return {
        "pii_docs": f"""
            SELECT doc_id, {counts},
                   ({total})::BIGINT AS n_pii_total
            FROM documents
        """,
        "redact_docs": f"""
            SELECT doc_id, {redacted} AS text FROM documents
        """,
    }


_SQL_M = "18446744073709551616"


def _sql_mulmod(x: str, c: int) -> str:
    """x*c mod 2**64 in DuckDB HUGEINT via 32-bit splitting."""
    lo = c % (1 << 32)
    return (f"(({x} % 4294967296) * {c} "
            f"+ (({x} // 4294967296) * {lo} % 4294967296) * 4294967296"
            f") % {_SQL_M}")


def _sql_xorshift(x: str, s: int) -> str:
    return f"xor(({x})::UBIGINT, ({x})::UBIGINT >> {s})::HUGEINT"


def _sql_splitmix64(x: str) -> str:
    """Full splitmix64 finalizer chain (hashkernels.mix64) as nested SQL
    (input HUGEINT in [0, 2**64) → UBIGINT expression)."""
    h1 = _sql_mulmod(_sql_xorshift(x, 30), 0xBF58476D1CE4E5B9)
    h2 = _sql_mulmod(_sql_xorshift(f"({h1})", 27), 0x94D049BB133111EB)
    return f"xor(({h2})::UBIGINT, ({h2})::UBIGINT >> 31)"


def _kmeans_oracle(
    k: int = 8, iters: int = 5, d: int = 64,
    scale_bits: int = 20, seed: int = 0,
    tail: str | None = None,
) -> str:
    """Exact replay of pipelines/similarity.kmeans: because the engine
    runs Lloyd's entirely in fixed-point integer arithmetic (quantize →
    integer distances → integer centroid floor-div), every iteration is
    bit-replayable as a chained CTE — no float summation order anywhere.
    DuckDB's `//` truncates toward zero, so the floor-div CASE emulates
    Python's floor semantics for negative sums."""
    from record_matcher_ray.pipelines.sampling import sql_sample_hash_cte

    C = f"{float(1 << scale_bits)!r}"
    cte, hcol = sql_sample_hash_cte("vec_id", seed=seed)
    dist = ("list_sum(list_transform(list_zip(p.qv, c.qv), "
            "z -> (z[1]-z[2])*(z[1]-z[2])))")
    sql = [f"""
        WITH q AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(x::DOUBLE * {C} + 0.5) AS BIGINT)) AS qv
          FROM embeddings
        ), t0 AS (SELECT vec_id, qv FROM q),{cte},
        c0 AS (
          SELECT (row_number() OVER (ORDER BY {hcol}, vec_id) - 1)::BIGINT
                   AS cid, qv
          FROM s5 ORDER BY {hcol}, vec_id LIMIT {k}
        )"""]
    for i in range(iters):
        sql.append(f""", a{i} AS (
          SELECT vec_id, qv, cid FROM (
            SELECT p.vec_id, p.qv, c.cid,
                   row_number() OVER (PARTITION BY p.vec_id
                                      ORDER BY {dist}, c.cid) AS rn
            FROM q p CROSS JOIN c{i} c) WHERE rn = 1
        ), u{i} AS (
          SELECT cid, r.j AS j, sum(qv[r.j]) AS s, count(*) AS cnt
          FROM a{i} CROSS JOIN range(1, {d + 1}) r(j)
          GROUP BY cid, r.j
        ), c{i + 1} AS (
          SELECT prev.cid, coalesce(upd.qv, prev.qv) AS qv
          FROM c{i} prev LEFT JOIN (
            SELECT cid, list(fd ORDER BY j) AS qv FROM (
              SELECT cid, j,
                     CAST(CASE WHEN s >= 0 THEN s // cnt
                          ELSE -(((-s) + cnt - 1) // cnt) END
                          AS BIGINT) AS fd
              FROM u{i}) GROUP BY cid) upd
          ON prev.cid = upd.cid
        )""")
    if tail is None:
        tail = f"""
        SELECT vec_id, cid AS cluster FROM (
          SELECT p.vec_id, c.cid,
                 row_number() OVER (PARTITION BY p.vec_id
                                    ORDER BY {dist}, c.cid) AS rn
          FROM q p CROSS JOIN c{iters} c) WHERE rn = 1
        ORDER BY vec_id"""
    sql.append(tail.replace("{DIST}", dist).replace("{LAST}",
                                                    f"c{iters}"))
    return "".join(sql)


def _davies_bouldin_oracle(**kw) -> str:
    """Davies-Bouldin (q=2 RMS) replay: extends the kmeans CTE chain —
    exact-int assignment d², HUGEINT cluster Σd², one sqrt per scatter,
    centroid-pair sqrt distances, max ratio, ascending-cluster ordered
    mean — mirroring similarity.davies_bouldin term for term."""
    tail = """
        , asg AS (
          SELECT vec_id, cid AS cluster, dmin FROM (
            SELECT p.vec_id, c.cid, {DIST} AS dmin,
                   row_number() OVER (PARTITION BY p.vec_id
                                      ORDER BY {DIST}, c.cid) AS rn
            FROM q p CROSS JOIN {LAST} c) WHERE rn = 1
        ), cl AS (
          SELECT cluster, count(*)::BIGINT AS n,
                 sum((dmin)::HUGEINT) AS ssq
          FROM asg GROUP BY cluster
        ), sv AS (
          SELECT cluster, n,
                 sqrt((ssq)::DOUBLE / (n)::DOUBLE) AS s
          FROM cl
        ), cd AS (
          SELECT a.cid AS i, b.cid AS j,
                 list_sum(list_transform(list_zip(a.qv, b.qv),
                          z -> (z[1]-z[2])*(z[1]-z[2]))) AS m2
          FROM {LAST} a JOIN {LAST} b ON a.cid <> b.cid
        ), r AS (
          SELECT si.cluster AS i,
                 max((si.s + sj.s) / sqrt((cd.m2)::DOUBLE)) AS d_i
          FROM sv si JOIN cd ON cd.i = si.cluster
                     JOIN sv sj ON sj.cluster = cd.j
          WHERE cd.m2 > 0
          GROUP BY si.cluster
        ), dsum AS (
          SELECT list_sum(list(coalesce(r.d_i, (0.0)::DOUBLE)
                               ORDER BY sv.cluster)) AS tot,
                 count(*)::BIGINT AS kk
          FROM sv LEFT JOIN r ON r.i = sv.cluster
        )
        SELECT sv.cluster, sv.n AS n_members,
               floor(sv.s * 1000000000.0 + 0.5) / 1000000000.0 AS s,
               floor(coalesce(r.d_i, (0.0)::DOUBLE)
                     * 1000000000.0 + 0.5) / 1000000000.0 AS d_i,
               floor((dsum.tot / (dsum.kk)::DOUBLE)
                     * 1000000000.0 + 0.5) / 1000000000.0 AS db
        FROM sv LEFT JOIN r ON r.i = sv.cluster CROSS JOIN dsum"""
    return _kmeans_oracle(tail=tail, **kw)


def _sketch_oracles() -> dict[str, str]:
    """SQL replay of the HyperLogLog pipeline (sketches.py): splitmix64
    hash → (bucket, rho) → per-group register max → exact HUGEINT
    register sum → the estimator in the engine's exact double
    association order (linear counting below 2.5m uses ln(), the same
    libm log as math.log)."""
    p, m = 12, 4096
    C264 = "18446744073709551616.0"
    hu = _sql_splitmix64(f"(v::HUGEINT % {_SQL_M} + {_SQL_M}) % {_SQL_M}")
    alpha = f"(0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / {m}.0))"
    raw = (f"(((({alpha} * {m}) * {m}) * {C264}) / (s::DOUBLE))")
    hll = f"""
        WITH vals AS (
          SELECT o_orderstatus AS grp, o_custkey AS v FROM orders
          UNION ALL
          SELECT 'ALL' AS grp, o_custkey AS v FROM orders
        ), hf AS (
          SELECT grp, ({hu}) AS hu FROM vals
        ), br AS (
          SELECT grp, (hu >> {64 - p})::BIGINT AS bucket,
                 ({_sql_mulmod("hu::HUGEINT", 1 << p)})::UBIGINT AS rest
          FROM hf
        ), s1 AS (SELECT grp, bucket, rest, (rest | (rest >> 1)) AS x FROM br
        ), s2 AS (SELECT grp, bucket, rest, (x | (x >> 2)) AS x FROM s1
        ), s3 AS (SELECT grp, bucket, rest, (x | (x >> 4)) AS x FROM s2
        ), s4 AS (SELECT grp, bucket, rest, (x | (x >> 8)) AS x FROM s3
        ), s5 AS (SELECT grp, bucket, rest, (x | (x >> 16)) AS x FROM s4
        ), s6 AS (SELECT grp, bucket, rest, (x | (x >> 32)) AS x FROM s5
        ), rt AS (
          SELECT grp, bucket,
                 CASE WHEN rest = 0 THEN {64 - p + 1}
                      ELSE 65 - bit_count(x)::BIGINT END AS rho
          FROM s6
        ), regs AS (
          SELECT grp, bucket, max(rho) AS reg FROM rt GROUP BY grp, bucket
        ), sums AS (
          SELECT grp,
                 sum(1::HUGEINT << (64 - reg)) AS s_present,
                 count(*) AS n_present
          FROM regs GROUP BY grp
        ), est AS (
          SELECT grp,
                 s_present + ({m} - n_present)::HUGEINT * (1::HUGEINT << 64)
                   AS s,
                 ({m} - n_present) AS zeros
          FROM sums
        )
        SELECT grp,
               round(CASE WHEN {raw} <= 2.5::DOUBLE * {m}.0 AND zeros > 0
                          THEN {m} * ln({m}.0 / zeros)
                          ELSE {raw} END, 6) AS approx_n
        FROM est ORDER BY grp
    """
    # count-min replay (sketches.count_min / cm_estimate): positions are
    # splitmix64(x ^ splitmix64(seed+i)) % width per depth row i; the
    # counter table is a plain GROUP BY, the probe a LEFT JOIN + min
    # (absent cells = 0 on both sides).
    import numpy as _np

    from record_matcher_ray.core.hashkernels import mix64 as _mix64

    depth, width, cm_seed = 4, 512, 0

    def _cm_pos(x: str, i: int) -> str:
        sc = int(_mix64(_np.array([cm_seed + i], _np.uint64))[0])
        seeded = f"xor(({x})::UBIGINT, {sc}::UBIGINT)::HUGEINT"
        return f"(({_sql_splitmix64(seeded)}) % {width})"

    data_rows = "\n            UNION ALL ".join(
        f"SELECT {i} AS i, {_cm_pos('o_custkey', i)} AS p FROM orders"
        for i in range(depth)
    )
    probe_rows = "\n            UNION ALL ".join(
        f"SELECT custkey, {i} AS i, {_cm_pos('custkey', i)} AS p FROM keys"
        for i in range(depth)
    )
    cm = f"""
        WITH keys AS (SELECT r.k::BIGINT AS custkey FROM range(1, 21) r(k)),
        pos AS (
          SELECT i, p, count(*) AS cnt FROM (
            {data_rows}
          ) GROUP BY i, p
        ), probe AS (
            {probe_rows}
        )
        SELECT k.custkey, min(coalesce(c.cnt, 0))::BIGINT AS est_count
        FROM probe k LEFT JOIN pos c ON k.i = c.i AND k.p = c.p
        GROUP BY k.custkey ORDER BY k.custkey
    """
    # KMV bottom-k replay (sketches.kmv_distinct): distinct splitmix64
    # hashes, k smallest, estimator (k-1)*2^64/h_k in one pinned double
    # division ((k-1)*2^64 is a power-of-two product — exact double).
    kmv_k = 256
    kmv = f"""
        WITH h AS (
          SELECT DISTINCT ({hu}) AS hu
          FROM (SELECT o_custkey AS v FROM orders)
        ), bk AS (SELECT hu FROM h ORDER BY hu LIMIT {kmv_k}),
        agg AS (
          SELECT count(*)::BIGINT AS n_kept,
                 coalesce(max(hu), 0)::UBIGINT AS kth,
                 (SELECT count(*) FROM h)::BIGINT AS n_all
          FROM bk
        )
        SELECT {kmv_k}::BIGINT AS k, n_kept, kth AS kth_hash,
               CASE WHEN n_all < {kmv_k} THEN n_all::DOUBLE
                    ELSE round({kmv_k - 1}.0::DOUBLE
                               * {C264} / kth::DOUBLE, 6)
               END AS est_distinct
        FROM agg
    """
    # KMV set-ops replay (sketches.kmv_set_ops): union-of-bottom-ks is a
    # valid union sketch; overlap fraction estimates Jaccard.
    kmv_setops = f"""
        WITH ha AS (
          SELECT DISTINCT ({hu}) AS hu
          FROM (SELECT o_custkey AS v FROM orders)
        ), ka AS (SELECT hu FROM ha ORDER BY hu LIMIT {kmv_k}),
        hb AS (
          SELECT DISTINCT ({hu}) AS hu
          FROM (SELECT c_custkey AS v FROM customer)
        ), kb AS (SELECT hu FROM hb ORDER BY hu LIMIT {kmv_k}),
        ku AS (
          SELECT hu FROM (
            SELECT DISTINCT hu FROM (
              SELECT hu FROM ka UNION ALL SELECT hu FROM kb)
          ) ORDER BY hu LIMIT {kmv_k}
        ), agg AS (
          SELECT count(*)::BIGINT AS n_u,
                 coalesce(max(hu), 0)::UBIGINT AS kth
          FROM ku
        ), ov AS (
          SELECT count(*)::BIGINT AS ov FROM ku
          WHERE hu IN (SELECT hu FROM ka)
            AND hu IN (SELECT hu FROM kb)
        ), sides AS (
          SELECT (SELECT count(*) FROM ka)::BIGINT AS n_a,
                 (SELECT count(*) FROM kb)::BIGINT AS n_b
        ), est AS (
          SELECT n_u, kth, ov, n_a, n_b,
                 CASE WHEN n_u = 0 THEN (0.0)::DOUBLE
                      WHEN n_u < {kmv_k} THEN (n_u)::DOUBLE
                      ELSE {kmv_k - 1}.0::DOUBLE * {C264}
                           / (kth)::DOUBLE
                 END AS eu,
                 CASE WHEN n_u = 0 THEN (0.0)::DOUBLE
                      ELSE (ov)::DOUBLE / (n_u)::DOUBLE
                 END AS jac
          FROM agg CROSS JOIN ov CROSS JOIN sides
        )
        SELECT {kmv_k}::BIGINT AS k, n_a, n_b, n_u AS n_union,
               kth AS kth_union, ov AS overlap,
               floor(eu * 1000000.0 + 0.5) / 1000000.0 AS est_union,
               floor(jac * 1000000.0 + 0.5) / 1000000.0 AS jaccard,
               floor(jac * eu * 1000000.0 + 0.5) / 1000000.0
                 AS est_intersection
        FROM est
    """
    return {
        "approx_distinct_orders": hll,
        "kmeans_embeddings": _kmeans_oracle(),
        "davies_bouldin_embeddings": _davies_bouldin_oracle(),
        "countmin_orders": cm,
        "kmv_orders": kmv,
        "kmv_setops_orders": kmv_setops,
    }


def _minhash_sig_oracle() -> str:
    """SQL replay of the 64-perm MinHash signature kernel. The (a, b)
    permutation constants come from the ENGINE's own MinHasher(seed=1),
    embedded as a VALUES list; the 64-bit multiply is the 32-bit-split
    column form of _sql_mulmod (the multiplier is a column here, not a
    literal)."""
    from record_matcher_ray.stages.blocking import MinHasher

    M = _SQL_M
    HALF = "9223372036854775808"
    hasher = MinHasher(num_perm=64, seed=1)
    perms = ", ".join(
        f"({j}, {int(av) | 1}, {int(bv)})"
        for j, (av, bv) in enumerate(zip(hasher.a, hasher.b))
    )
    # column-mulmod: s64 < 2**61, ab <= 2**61 → every term < 2**94, safe
    # in HUGEINT
    sigv = (f"((s64::HUGEINT % 4294967296) * ab "
            f"+ (((s64::HUGEINT // 4294967296) * (ab % 4294967296)) "
            f"% 4294967296) * 4294967296 + b) % {M}")
    m1 = _sql_mulmod(_sql_xorshift("p", 30), 0xBF58476D1CE4E5B9)
    m2 = _sql_mulmod(_sql_xorshift("h", 27), 0x94D049BB133111EB)
    return f"""
        WITH norm AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(coalesce(text,'')),
                                     '[^a-z0-9]+', ' ', 'g')) AS s
          FROM documents
        ), wins AS (
          SELECT doc_id, s,
                 unnest(generate_series(1, greatest(length(s) - 3, 1))) AS i
          FROM norm WHERE length(s) > 0
        ), grams AS (
          SELECT doc_id, substr(s, i, 4) AS w FROM wins
        ), poly AS (
          SELECT doc_id,
            (CASE length(w)
              WHEN 4 THEN ((ascii(substr(w,1,1))::HUGEINT*1000003
                            + ascii(substr(w,2,1)))*1000003
                           + ascii(substr(w,3,1)))*1000003
                          + ascii(substr(w,4,1))
              WHEN 3 THEN (ascii(substr(w,1,1))::HUGEINT*1000003
                           + ascii(substr(w,2,1)))*1000003
                          + ascii(substr(w,3,1))
              WHEN 2 THEN ascii(substr(w,1,1))::HUGEINT*1000003
                          + ascii(substr(w,2,1))
              ELSE ascii(substr(w,1,1))::HUGEINT END) % {M} AS p
          FROM grams
        ), m1 AS (SELECT doc_id, {m1} AS h FROM poly
        ), m2 AS (SELECT doc_id, {m2} AS h FROM m1
        ), sh AS (
          SELECT DISTINCT doc_id,
                 (xor(h::UBIGINT, h::UBIGINT >> 31) >> 3) AS s64
          FROM m2
        ), perms(j, ab, b) AS (VALUES {perms}),
        sigs AS (
          SELECT doc_id, j, min({sigv}) AS v
          FROM sh CROSS JOIN perms
          GROUP BY doc_id, j
        )
        SELECT d.doc_id, p.j AS perm,
               coalesce(CASE WHEN g.v < {HALF} THEN g.v
                             ELSE g.v - {M} END, 0)::BIGINT AS sig
        FROM documents d CROSS JOIN perms p
        LEFT JOIN sigs g ON g.doc_id = d.doc_id AND g.j = p.j
        ORDER BY d.doc_id, p.j
    """


def _minhash_pairs_oracle() -> str:
    """Full SQL replay of minhash_dedup's verified-pairs output
    (dedup.py: _shingle_sig_table → batch_band_keys →
    _bucket_pairs_fn(max_bucket=200, est_cut=48) → distinct →
    exact-jaccard verify at threshold 60): shingles and signatures as in
    _minhash_sig_oracle; band key = ((su0·B⁴+su1·B³+su2·B²+su3·B+band)
    mod 2⁶⁴) >> 6 | 3<<58 (blocking.batch_band_keys + tag_keys); bucket
    cap = band-key group size ∈ [2, 200]; estimate prefilter = equal
    golden-folded signature bytes ·100/64 ≥ 48 (exact dyadic floats both
    sides); verify = round(100·|∩|/|∪|, 6) ≥ 60 over the 45-bit-masked
    distinct shingles (the engine's searchsorted kernel's exact input)."""
    return _minhash_pairs_body("SELECT doc_id, text FROM documents") + """
        SELECT c.a, c.b,
               round(100.0 * i.i / (la.n + lb.n - i.i), 6) AS jaccard
        FROM cand2 c
        JOIN inter i ON i.a = c.a AND i.b = c.b
        JOIN lens la ON la.doc_id = c.a
        JOIN lens lb ON lb.doc_id = c.b
        WHERE round(100.0 * i.i / (la.n + lb.n - i.i), 6) >= 60.0
    """


def _minhash_decontam_oracle() -> str:
    """Replay of minhash_decontam over _q_minhash_decontam's fixture:
    train = documents tagged id*2, eval = every-7th doc truncated to 4/5
    length tagged id*2+1 (ASCII corpus ⇒ substr == Python slice); same
    LSH pairs replay, then cross-side filter + decode (>>1 == //2 for
    non-negative ids)."""
    source = """
          SELECT doc_id * 2 AS doc_id, text FROM documents
          UNION ALL
          SELECT doc_id * 2 + 1 AS doc_id,
                 substr(coalesce(text,''), 1,
                        greatest(1, (length(coalesce(text,'')) * 4) // 5))
                   AS text
          FROM documents WHERE doc_id % 7 = 0
    """
    return _minhash_pairs_body(source) + """
        SELECT (CASE WHEN c.a % 2 = 0 THEN c.a ELSE c.b END) // 2
                 AS train_id,
               (CASE WHEN c.a % 2 = 1 THEN c.a ELSE c.b END) // 2
                 AS eval_id,
               round(100.0 * i.i / (la.n + lb.n - i.i), 6) AS jaccard
        FROM cand2 c
        JOIN inter i ON i.a = c.a AND i.b = c.b
        JOIN lens la ON la.doc_id = c.a
        JOIN lens lb ON lb.doc_id = c.b
        WHERE round(100.0 * i.i / (la.n + lb.n - i.i), 6) >= 60.0
          AND (c.a % 2) <> (c.b % 2)
    """


def _minhash_pairs_body(source: str) -> str:
    """Shared WITH-chain of the minhash-LSH replay (shingles →
    signatures → band keys → capped buckets → estimate prefilter →
    intersection/lengths) over any (doc_id, text) source. See
    _minhash_pairs_oracle for the semantics map."""
    from record_matcher_ray.stages.blocking import MinHasher

    M = _SQL_M
    B = 1000003
    GOLDEN = 0x9E3779B97F4A7C15
    hasher = MinHasher(num_perm=64, seed=1)
    perms = ", ".join(
        f"({j}, {int(av) | 1}, {int(bv)})"
        for j, (av, bv) in enumerate(zip(hasher.a, hasher.b))
    )
    sigv = (f"((s64::HUGEINT % 4294967296) * ab "
            f"+ (((s64::HUGEINT // 4294967296) * (ab % 4294967296)) "
            f"% 4294967296) * 4294967296 + b) % {M}")
    m1 = _sql_mulmod(_sql_xorshift("p", 30), 0xBF58476D1CE4E5B9)
    m2 = _sql_mulmod(_sql_xorshift("h", 27), 0x94D049BB133111EB)
    pw = {k: pow(B, 4 - k, 1 << 64) for k in range(4)}
    term = " ".join(
        f"WHEN {k} THEN {_sql_mulmod('v', pw[k])}" for k in range(4)
    )
    mask45 = (1 << 45) - 1
    return f"""
        WITH norm AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(coalesce(text,'')),
                                     '[^a-z0-9]+', ' ', 'g')) AS s
          FROM ({source}) __src
        ), wins AS (
          SELECT doc_id, s,
                 unnest(generate_series(1, greatest(length(s) - 3, 1))) AS i
          FROM norm WHERE length(s) > 0
        ), grams AS (
          SELECT doc_id, substr(s, i, 4) AS w FROM wins
        ), poly AS (
          SELECT doc_id,
            (CASE length(w)
              WHEN 4 THEN ((ascii(substr(w,1,1))::HUGEINT*1000003
                            + ascii(substr(w,2,1)))*1000003
                           + ascii(substr(w,3,1)))*1000003
                          + ascii(substr(w,4,1))
              WHEN 3 THEN (ascii(substr(w,1,1))::HUGEINT*1000003
                           + ascii(substr(w,2,1)))*1000003
                          + ascii(substr(w,3,1))
              WHEN 2 THEN ascii(substr(w,1,1))::HUGEINT*1000003
                          + ascii(substr(w,2,1))
              ELSE ascii(substr(w,1,1))::HUGEINT END) % {M} AS p
          FROM grams
        ), m1 AS (SELECT doc_id, {m1} AS h FROM poly
        ), m2 AS (SELECT doc_id, {m2} AS h FROM m1
        ), sh AS (
          SELECT DISTINCT doc_id,
                 (xor(h::UBIGINT, h::UBIGINT >> 31) >> 3) AS s64
          FROM m2
        ), perms(j, ab, b) AS (VALUES {perms}),
        sigs AS (
          SELECT doc_id, j, min({sigv}) AS v
          FROM sh CROSS JOIN perms
          GROUP BY doc_id, j
        ), folds AS (
          SELECT doc_id, j // 4 AS band,
                 (CASE j % 4 {term} END) AS t
          FROM sigs
        ), bk AS (
          SELECT doc_id,
                 (((((sum(t) + band) % {M})::UBIGINT >> 6)
                   | (3::UBIGINT << 58))::HUGEINT)::BIGINT AS band_key
          FROM folds GROUP BY doc_id, band
        ), bsz AS (
          SELECT band_key, count(*) AS n FROM bk GROUP BY band_key
        ), cand AS (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bk x
          JOIN bk y ON x.band_key = y.band_key AND x.doc_id < y.doc_id
          JOIN bsz s ON s.band_key = x.band_key
          WHERE s.n BETWEEN 2 AND 200
        ), est AS (
          SELECT doc_id, j,
                 (({_sql_mulmod('v', GOLDEN)})::UBIGINT >> 56) AS u8
          FROM sigs
        ), cand2 AS (
          SELECT c.a, c.b
          FROM cand c
          JOIN est ea ON ea.doc_id = c.a
          JOIN est eb ON eb.doc_id = c.b AND eb.j = ea.j
          GROUP BY c.a, c.b
          HAVING sum(CASE WHEN ea.u8 = eb.u8 THEN 1 ELSE 0 END)
                 * 100.0 / 64.0 >= 48.0
        ), sh45 AS (
          SELECT DISTINCT doc_id, (s64 & {mask45}) AS v FROM sh
        ), lens AS (
          SELECT doc_id, count(*) AS n FROM sh45 GROUP BY doc_id
        ), inter AS (
          SELECT c.a, c.b, count(*) AS i
          FROM cand2 c
          JOIN sh45 xa ON xa.doc_id = c.a
          JOIN sh45 xb ON xb.doc_id = c.b AND xb.v = xa.v
          GROUP BY c.a, c.b
        )
    """


def _minhash_recall_oracle() -> str:
    """Replay of _q_minhash_recall's one-row metrics: truth = all-pairs
    exact jaccard (>= 60, both sides shingled) over the first-150-doc
    slice via a shingle self-join on the UNMASKED 61-bit hashes (the
    engine's float32 intersection matmul is exact for these counts);
    verified = the full LSH pairs replay over the same slice; recall =
    |ver ∩ truth| / max(1, |truth|) rounded to 6."""
    src = "SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 150"
    return _minhash_pairs_body(src) + """
        , ver AS (
          SELECT c.a, c.b
          FROM cand2 c
          JOIN inter i ON i.a = c.a AND i.b = c.b
          JOIN lens la ON la.doc_id = c.a
          JOIN lens lb ON lb.doc_id = c.b
          WHERE round(100.0 * i.i / (la.n + lb.n - i.i), 6) >= 60.0
        ), tl AS (
          SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        ), tinter AS (
          SELECT xa.doc_id AS a, xb.doc_id AS b, count(*) AS i
          FROM sh xa
          JOIN sh xb ON xb.s64 = xa.s64 AND xa.doc_id < xb.doc_id
          GROUP BY 1, 2
        ), truth AS (
          SELECT t.a, t.b
          FROM tinter t
          JOIN tl la ON la.doc_id = t.a
          JOIN tl lb ON lb.doc_id = t.b
          WHERE round(100.0 * t.i / (la.n + lb.n - t.i), 6) >= 60.0
        )
        SELECT
          (SELECT count(*) FROM truth) AS n_true_pairs,
          (SELECT count(*) FROM ver) AS n_verified_pairs,
          round((SELECT count(*) FROM
                   (SELECT * FROM ver INTERSECT SELECT * FROM truth)
                )::DOUBLE
                / greatest(1, (SELECT count(*) FROM truth)), 6)
            AS verified_recall,
          (SELECT count(*) FROM
             (SELECT * FROM ver EXCEPT SELECT * FROM truth))
            AS false_positives
    """


def _hash_oracles() -> dict[str, str]:
    """SQL mirrors of the DETERMINISTIC hash pipelines (r3: drops the
    simhash/fingerprint/simhash-near-dup rows from `no_oracle` to
    driver-hash-checked — VERDICT r2 next-round item 3).

    Both engines compute mod-2**64 polynomial hashes; DuckDB has no
    wraparound arithmetic, so 64-bit multiplies are emulated in HUGEINT
    by 32-bit splitting: x*c mod 2^64 = (x_lo*c + ((x_hi*c_lo) mod 2^32)
    * 2^32) mod 2^64. splitmix64's xor/shift steps run in UBIGINT (never
    overflow). ASCII-only text assumption (CLAUDE.md parity gotchas —
    holds for every testdata corpus; chars == bytes after it)."""
    M = _SQL_M
    HALF = "9223372036854775808"
    mulmod = _sql_mulmod
    xorshift = _sql_xorshift

    # simhash64 (dedup.py:882): normalize → distinct char-4-gram
    # poly+splitmix64 hashes >> 3 → golden-ratio spread → per-bit vote
    simhash_fp_cte = f"""
        WITH norm AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(coalesce(text,'')),
                                     '[^a-z0-9]+', ' ', 'g')) AS s
          FROM documents
        ), wins AS (
          SELECT doc_id, s,
                 unnest(generate_series(1, greatest(length(s) - 3, 1))) AS i
          FROM norm WHERE length(s) > 0
        ), grams AS (
          SELECT doc_id, substr(s, i, 4) AS w FROM wins
        ), poly AS (
          SELECT doc_id,
            (CASE length(w)
              WHEN 4 THEN ((ascii(substr(w,1,1))::HUGEINT*1000003
                            + ascii(substr(w,2,1)))*1000003
                           + ascii(substr(w,3,1)))*1000003
                          + ascii(substr(w,4,1))
              WHEN 3 THEN (ascii(substr(w,1,1))::HUGEINT*1000003
                           + ascii(substr(w,2,1)))*1000003
                          + ascii(substr(w,3,1))
              WHEN 2 THEN ascii(substr(w,1,1))::HUGEINT*1000003
                          + ascii(substr(w,2,1))
              ELSE ascii(substr(w,1,1))::HUGEINT END) % {M} AS p
          FROM grams
        ), m1 AS (
          SELECT doc_id,
                 {mulmod(xorshift('p', 30), 0xBF58476D1CE4E5B9)} AS h
          FROM poly
        ), m2 AS (
          SELECT doc_id,
                 {mulmod(xorshift('h', 27), 0x94D049BB133111EB)} AS h
          FROM m1
        ), shingle AS (
          SELECT DISTINCT doc_id,
                 xor(h::UBIGINT, h::UBIGINT >> 31) >> 3 AS sh64
          FROM m2
        ), golden AS (
          SELECT doc_id,
                 ({mulmod('sh64::HUGEINT', 0x9E3779B97F4A7C15)})::UBIGINT AS g
          FROM shingle
        ), votes AS (
          SELECT doc_id, b,
                 count(*) FILTER (WHERE (g >> b::UBIGINT) & 1 = 1) AS cnt,
                 count(*) AS n
          FROM golden, (SELECT unnest(generate_series(0, 63)) AS b) bits
          GROUP BY doc_id, b
        ), fp AS (
          SELECT doc_id,
                 sum(CASE WHEN 2*cnt > n THEN 1::HUGEINT << b
                          ELSE 0::HUGEINT END) AS v
          FROM votes GROUP BY doc_id
        ), sim AS (
          SELECT d.doc_id AS id,
                 coalesce(CASE WHEN f.v < {HALF} THEN f.v
                               ELSE f.v - {M} END, 0)::BIGINT AS simhash
          FROM documents d LEFT JOIN fp f ON d.doc_id = f.doc_id
        )
    """

    # fingerprints (analysis.py:183): min of stride-4 16-byte rolling
    # poly hashes over RAW text (no normalization, no mix). Two branches:
    # docs >= 16 chars use a fixed 16-step fold reduced every 3rd step
    # (2^64 * (2^20)^3 < 2^127 so HUGEINT never overflows — measured 2.7×
    # faster than per-step CASE+mod); short docs fold their exact length.
    fp16 = "ascii(substr(w,1,1))::HUGEINT"
    for k in range(2, 17):
        fp16 = (f"(({fp16} * 1000003 + ascii(substr(w,{k},1))) % {M})"
                if k % 3 == 0
                else f"({fp16} * 1000003 + ascii(substr(w,{k},1)))")
    fp16 = fp16.replace("w", "substr(s, 1 + i*4, 16)")
    fp_var = "0::HUGEINT"
    for k in range(1, 16):
        fp_var = (f"(CASE WHEN length(w) >= {k} THEN ({fp_var} * 1000003 "
                  f"+ ascii(substr(w,{k},1))) % {M} ELSE {fp_var} END)")

    return {
        "simhash_docs": simhash_fp_cte + """
            SELECT id, simhash FROM sim ORDER BY id
        """,
        # minhash signature replay (hashkernels.batch_signatures via
        # blocking.batch_char_shingles): shingle = splitmix64(4-gram
        # fwd-poly) >> 3 (same chain as simhash's gram hash, no
        # golden-spread), then per perm j: min over shingles of
        # ((a_j|1)*sh + b_j) mod 2**64, unsigned min, int64 bit pattern;
        # shingle-less docs -> sig 0 for every perm.
        "minhash_signatures_docs": _minhash_sig_oracle(),
        "minhash_dedup_docs": _minhash_pairs_oracle(),
        "minhash_decontam_docs": _minhash_decontam_oracle(),
        "minhash_recall_docs": _minhash_recall_oracle(),
        "simhash_near_dups_docs": simhash_fp_cte + f"""
            SELECT a.id AS id_a, b.id AS id_b,
                   bit_count(xor(((a.simhash::HUGEINT % {M} + {M}) % {M})::UBIGINT,
                                 ((b.simhash::HUGEINT % {M} + {M}) % {M})::UBIGINT)
                             )::BIGINT AS hamming
            FROM sim a JOIN sim b ON a.id < b.id
            WHERE a.simhash <> 0 AND b.simhash <> 0
              AND bit_count(xor(((a.simhash::HUGEINT % {M} + {M}) % {M})::UBIGINT,
                                ((b.simhash::HUGEINT % {M} + {M}) % {M})::UBIGINT)) <= 3
        """,
        "fingerprint_docs": f"""
            WITH base AS (
              SELECT doc_id, coalesce(text,'') AS s FROM documents
            ), longdocs AS (
              SELECT doc_id, s,
                     unnest(generate_series(0, (length(s)-16)//4)) AS i
              FROM base WHERE length(s) >= 16
            ), h16 AS (
              SELECT doc_id, {fp16} % {M} AS h FROM longdocs
            ), shortdocs AS (
              SELECT doc_id, s AS w
              FROM base WHERE length(s) > 0 AND length(s) < 16
            ), hvar AS (
              SELECT doc_id, {fp_var} AS h FROM shortdocs
            ), fp AS (
              SELECT doc_id, min(h) AS v
              FROM (SELECT * FROM h16 UNION ALL SELECT * FROM hvar)
              GROUP BY doc_id
            )
            SELECT d.doc_id AS doc_id,
                   coalesce(CASE WHEN f.v < {HALF} THEN f.v
                                 ELSE f.v - {M} END, 0)::BIGINT AS fp64
            FROM documents d LEFT JOIN fp f ON d.doc_id = f.doc_id
        """,
    }


def oracle_sql() -> dict[str, str]:
    stop = ", ".join(f"'{w}'" for w in sorted(
        {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
         "on", "with", "as", "at", "by", "be"}))
    bpe = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"
    return {
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_rows
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "customer_topk": """
            SELECT c_custkey, c_name, n_name, r_name,
                   round(c_acctbal, 2) AS c_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 20
        """,
        "orders_by_status": """
            SELECT o_orderstatus, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "events_window": """
            SELECT event_type, epoch_us(ts) // 3600000000 AS win,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "topk_per_group": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey)
                     AS rnk
            FROM orders
            QUALIFY rnk <= 2
        """,
        "sessionize_events": """
            WITH e AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN epoch_us(ts) // 1000000
                               - lag(epoch_us(ts) // 1000000)
                                 OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) > 1800
                          THEN 1 ELSE 0 END AS brk
              FROM events
            ), s AS (
              SELECT user_id, event_id, ts, value,
                     CAST(1 + sum(brk) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS session_id
              FROM e
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
                   round(sum(value), 2) AS sum_value
            FROM s GROUP BY 1, 2
        """,
        "last_error_asof": """
            SELECT l.event_id,
                   r.ts AS last_error_ts
            FROM events l
            ASOF LEFT JOIN (SELECT user_id, ts FROM events
                            WHERE event_type = 'error') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "events_sliding_window": """
            SELECT event_type, win, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM (
              SELECT event_type, value,
                     unnest(generate_series(
                       (epoch_us(ts) - 3600000000) // 1800000000 + 1,
                       epoch_us(ts) // 1800000000)) AS win
              FROM events
            ) GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "building_orders_semi": """
            SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'BUILDING')
        """,
        "building_orders_bloom": """
            SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'BUILDING')
        """,
        "events_props_extract": """
            SELECT event_id,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "uniqueness_customer": """
            SELECT col, uniqueness FROM (
              SELECT 'c_name' AS col,
                     count(DISTINCT nullif(cast(c_name AS varchar), ''))::double
                       / count(*) AS uniqueness FROM customer
              UNION ALL
              SELECT 'c_mktsegment',
                     count(DISTINCT nullif(cast(c_mktsegment AS varchar), ''))::double
                       / count(*) FROM customer
              UNION ALL
              SELECT 'c_nationkey',
                     count(DISTINCT nullif(cast(c_nationkey AS varchar), ''))::double
                       / count(*) FROM customer
            ) ORDER BY col
        """,
        "group_by_segment": """
            SELECT * FROM customer
            WHERE cast(c_mktsegment AS varchar) = 'BUILDING'
        """,
        "duplicated_orders": """
            SELECT * FROM orders
            QUALIFY count(*) OVER (PARTITION BY o_custkey) > 1
        """,
        "match_exact_customer": """
            SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
                   'R-' || cast(c_custkey AS varchar) AS matched_registry_id,
                   'MATCHED' AS match_status,
                   cast(c_custkey AS varchar) AS "row(s)_matched",
                   '100.0' AS match_score
            FROM customer
        """,
        "supplier_levenshtein": """
            SELECT s_suppkey, n_nationkey,
                   round(CASE
                     WHEN s_name = n_name THEN 100.0
                     WHEN greatest(length(s_name), length(n_name)) = 0 THEN 100.0
                     WHEN length(s_name) = 0 OR length(n_name) = 0 THEN 0.0
                     ELSE 100.0 * (1.0 - levenshtein(s_name, n_name)::double
                          / greatest(length(s_name), length(n_name)))
                   END, 6) AS lev_sim
            FROM supplier, nation
        """,
        # engine jw == DuckDB jaro_winkler_similarity on non-empty ASCII
        # (boost>0.7, prefix<=4; divergence only at ("",""): engine 100)
        "supplier_jaro": """
            SELECT s_suppkey, n_nationkey,
                   round(100.0 * jaro_winkler_similarity(s_name, n_name), 6)
                     AS jw_sim
            FROM supplier, nation
        """,
        "dedup_exact_docs": """
            SELECT text, min(doc_id) AS keeper_id, count(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "lang_id_docs": """
            WITH t AS (
              SELECT doc_id,
                     list_distinct(list_filter(
                       string_split_regex(lower(coalesce(text, '')), '\\s+'),
                       x -> x <> '')) AS toks
              FROM documents
            ), h AS (
              SELECT doc_id, toks,
                len(list_intersect(toks,
                  ['the','and','of','to','in','is','for','with'])) AS en,
                len(list_intersect(toks,
                  ['el','la','de','que','y','en','los','del'])) AS es,
                len(list_intersect(toks,
                  ['le','la','de','et','les','des','un','une'])) AS fr,
                len(list_intersect(toks,
                  ['der','die','und','das','von','mit','den','ein'])) AS de
              FROM t
            )
            SELECT doc_id,
              -- >= comparisons implement the engine's first-wins tie rule
              -- over profile order (en, es, fr, de); all-zero => 'und'
              CASE WHEN en=0 AND es=0 AND fr=0 AND de=0 THEN 'und'
                   WHEN en >= es AND en >= fr AND en >= de THEN 'en'
                   WHEN es >= fr AND es >= de THEN 'es'
                   WHEN fr >= de THEN 'fr' ELSE 'de' END AS pred_lang,
              round(greatest(en,es,fr,de)::DOUBLE / greatest(len(toks), 1), 6)
                AS lang_score
            FROM h
        """,
        **_sampling_oracles(),
        "repetition_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), base AS (
              SELECT doc_id,
                     CASE WHEN len(nt) = 0 THEN CAST([] AS VARCHAR[])
                          ELSE string_split(nt, ' ') END AS toks
              FROM t
            ), b AS (
              SELECT doc_id, toks, len(toks) AS n_tokens,
                     len(list_distinct(toks)) AS n_distinct
              FROM base
            ), g2 AS (
              SELECT doc_id, unnest(list_transform(
                generate_series(1, len(toks) - 1),
                i -> toks[i] || chr(31) || toks[i+1])) AS g
              FROM b WHERE n_tokens >= 2
            ), m2 AS (
              SELECT doc_id, max(c) AS mx
              FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2)
              GROUP BY 1
            ), g3 AS (
              SELECT doc_id, unnest(list_transform(
                generate_series(1, len(toks) - 2),
                i -> toks[i] || chr(31) || toks[i+1] || chr(31) || toks[i+2]))
                AS g
              FROM b WHERE n_tokens >= 3
            ), m3 AS (
              SELECT doc_id, max(c) AS mx
              FROM (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2)
              GROUP BY 1
            )
            SELECT b.doc_id, b.n_tokens,
                   round(CASE WHEN b.n_tokens > 0 THEN
                         (b.n_tokens - b.n_distinct)::DOUBLE / b.n_tokens
                         ELSE 0 END, 6) AS dup_token_frac,
                   round(coalesce(m2.mx, 0)::DOUBLE /
                         greatest(b.n_tokens - 1, 1), 6) AS top2gram_frac,
                   round(coalesce(m3.mx, 0)::DOUBLE /
                         greatest(b.n_tokens - 2, 1), 6) AS top3gram_frac
            FROM b LEFT JOIN m2 USING (doc_id) LEFT JOIN m3 USING (doc_id)
        """,
        "orders_customer_full": """
            SELECT CAST(o.o_orderkey AS DOUBLE) AS o_orderkey,
                   CAST(coalesce(o.o_custkey, c.c_custkey) AS DOUBLE)
                       AS o_custkey,
                   CAST(c.c_acctbal AS DOUBLE) AS c_acctbal
            FROM orders o FULL JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "dup_span_stats_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), win AS (
              SELECT doc_id, unnest(
                CASE WHEN length(nt) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN length(nt) <= 16 THEN [nt]
                     ELSE list_transform(generate_series(1, length(nt) - 15),
                                         i -> substr(nt, i, 16))
                END) AS g
              FROM t
            ), per AS (
              SELECT doc_id, g, count(*)::BIGINT AS cnt
              FROM win GROUP BY doc_id, g
            ), dup AS (
              SELECT g FROM per GROUP BY g
              HAVING count(DISTINCT doc_id) >= 2
            )
            SELECT p.doc_id, sum(p.cnt)::BIGINT AS n_windows,
                   sum(CASE WHEN d.g IS NOT NULL THEN p.cnt ELSE 0
                       END)::BIGINT AS n_dup_windows,
                   round(sum(CASE WHEN d.g IS NOT NULL THEN p.cnt ELSE 0
                             END)::DOUBLE / sum(p.cnt), 6) AS dup_frac
            FROM per p LEFT JOIN dup d ON p.g = d.g
            GROUP BY p.doc_id
        """,
        "dup_spans_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), win AS (
              SELECT doc_id, nt, unnest(
                CASE WHEN length(nt) = 0 THEN CAST([] AS BIGINT[])
                     WHEN length(nt) <= 16 THEN [CAST(0 AS BIGINT)]
                     ELSE list_transform(generate_series(1, length(nt) - 15),
                                         i -> CAST(i - 1 AS BIGINT))
                END) AS pos
              FROM t
            ), w2 AS (
              SELECT doc_id, pos,
                     substr(nt, CAST(pos + 1 AS INT), 16) AS g,
                     least(pos + 16, length(nt))::BIGINT AS end_
              FROM win
            ), dup AS (
              SELECT g FROM w2 GROUP BY g
              HAVING count(DISTINCT doc_id) >= 2
            ), d AS (
              SELECT doc_id, pos, end_ FROM w2
              WHERE g IN (SELECT g FROM dup)
            ), m AS (
              SELECT doc_id, pos, end_,
                     max(end_) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_max
              FROM d
            ), i AS (
              SELECT doc_id, pos, end_,
                     CASE WHEN prev_max IS NULL OR pos > prev_max
                          THEN 1 ELSE 0 END AS brk
              FROM m
            ), c AS (
              SELECT doc_id, pos, end_,
                     sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS isl
              FROM i
            )
            SELECT doc_id, min(pos)::BIGINT AS span_start,
                   max(end_)::BIGINT AS span_end
            FROM c GROUP BY doc_id, isl
        """,
        "strip_spans_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), win AS (
              SELECT doc_id, nt, unnest(
                CASE WHEN length(nt) = 0 THEN CAST([] AS BIGINT[])
                     WHEN length(nt) <= 16 THEN [CAST(0 AS BIGINT)]
                     ELSE list_transform(generate_series(1, length(nt) - 15),
                                         i -> CAST(i - 1 AS BIGINT))
                END) AS pos
              FROM t
            ), w2 AS (
              SELECT doc_id, pos,
                     substr(nt, CAST(pos + 1 AS INT), 16) AS g,
                     least(pos + 16, length(nt))::BIGINT AS end_
              FROM win
            ), dup AS (
              SELECT g FROM w2 GROUP BY g
              HAVING count(DISTINCT doc_id) >= 2
            ), d AS (
              SELECT doc_id, pos, end_ FROM w2
              WHERE g IN (SELECT g FROM dup)
            ), m AS (
              SELECT doc_id, pos, end_,
                     max(end_) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_max
              FROM d
            ), i AS (
              SELECT doc_id, pos, end_,
                     CASE WHEN prev_max IS NULL OR pos > prev_max
                          THEN 1 ELSE 0 END AS brk
              FROM m
            ), c AS (
              SELECT doc_id, pos, end_,
                     sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS isl
              FROM i
            ), spans AS (
              SELECT doc_id, min(pos) AS s, max(end_) AS e
              FROM c GROUP BY doc_id, isl
            ), segs AS (
              -- kept segment before each span (may be empty)
              SELECT doc_id, lag(e, 1, 0) OVER (
                       PARTITION BY doc_id ORDER BY s) AS ks, s AS ke
              FROM spans
              UNION ALL
              -- tail segment after the last span
              SELECT sp.doc_id, max(sp.e) AS ks, length(t.nt)::BIGINT AS ke
              FROM spans sp JOIN t USING (doc_id)
              GROUP BY sp.doc_id, length(t.nt)
            ), rebuilt AS (
              SELECT s.doc_id,
                     string_agg(substr(t.nt, CAST(s.ks + 1 AS INT),
                                       CAST(s.ke - s.ks AS INT)),
                                '' ORDER BY s.ks) AS txt
              FROM segs s JOIN t USING (doc_id)
              GROUP BY s.doc_id
            )
            SELECT t.doc_id, coalesce(r.txt, t.nt) AS text
            FROM t LEFT JOIN rebuilt r USING (doc_id)
        """,
        "lm_quality_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(string_split(nt, ' ')) AS term
              FROM t WHERE len(nt) > 0
            ), counts AS (
              SELECT term, count(*)::BIGINT AS c FROM tok GROUP BY term
            ), tot AS (
              SELECT sum(c)::DOUBLE AS n FROM counts
            ), vocab AS (
              SELECT term, c FROM counts ORDER BY c DESC, term LIMIT 4096
            ), lp AS (
              SELECT tok.doc_id,
                     coalesce(ln(v.c::DOUBLE / (SELECT n FROM tot)),
                              ln(1.0 / (SELECT n FROM tot))) AS l
              FROM tok LEFT JOIN vocab v ON tok.term = v.term
            )
            SELECT doc_id, count(*)::BIGINT AS n_tokens,
                   round(-avg(l), 6) AS xent
            FROM lp GROUP BY doc_id
        """,
        "decontam_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), win AS (
              SELECT doc_id, unnest(
                CASE WHEN length(nt) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN length(nt) < 16 THEN [nt]
                     ELSE list_transform(generate_series(1, length(nt) - 15),
                                         i -> substr(nt, i, 16))
                END) AS g
              FROM t
            ), ref AS (
              SELECT DISTINCT g FROM win WHERE doc_id % 20 = 0
            )
            SELECT w.doc_id, count(*) AS n_windows,
                   round(sum(CASE WHEN r.g IS NOT NULL THEN 1 ELSE 0
                             END)::DOUBLE / count(*), 6) AS contained_frac
            FROM win w LEFT JOIN ref r ON w.g = r.g
            GROUP BY w.doc_id
        """,
        "ngram_jaccard_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), g AS (
              SELECT doc_id, unnest(list_distinct(
                CASE WHEN length(nt) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN length(nt) < 4 THEN [nt]
                     ELSE list_transform(generate_series(1, length(nt) - 3),
                                         i -> substr(nt, i, 4))
                END)) AS gram
              FROM t
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM g GROUP BY 1
            ), pairs AS (
              SELECT g1.doc_id AS id_a, g2.doc_id AS id_b,
                     count(*) AS n_common
              FROM g g1 JOIN g g2
                ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id
              GROUP BY 1, 2
            )
            SELECT p.id_a, p.id_b, p.n_common,
                   round(100.0 * p.n_common / (sa.n + sb.n - p.n_common), 6)
                     AS jaccard
            FROM pairs p
            JOIN sizes sa ON p.id_a = sa.doc_id
            JOIN sizes sb ON p.id_b = sb.doc_id
            WHERE 100.0 * p.n_common / (sa.n + sb.n - p.n_common) >= 60.0
        """,
        "decontam_near_docs": """
            -- eval = every 7th doc truncated to its first 80% of chars;
            -- exact char-4-gram jaccard between train and eval corpora
            WITH ev_raw AS (
              SELECT doc_id,
                     substr(coalesce(text, ''), 1,
                            greatest((length(coalesce(text, '')) * 4) // 5,
                                     1)) AS text
              FROM documents WHERE doc_id % 7 = 0
            ), tn AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), en AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(text),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM ev_raw
            ), tg AS (
              SELECT doc_id, unnest(list_distinct(
                CASE WHEN length(nt) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN length(nt) < 4 THEN [nt]
                     ELSE list_transform(generate_series(1, length(nt) - 3),
                                         i -> substr(nt, i, 4))
                END)) AS gram
              FROM tn
            ), eg AS (
              SELECT doc_id, unnest(list_distinct(
                CASE WHEN length(nt) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN length(nt) < 4 THEN [nt]
                     ELSE list_transform(generate_series(1, length(nt) - 3),
                                         i -> substr(nt, i, 4))
                END)) AS gram
              FROM en
            ), ts AS (
              SELECT doc_id, count(*) AS n FROM tg GROUP BY 1
            ), es AS (
              SELECT doc_id, count(*) AS n FROM eg GROUP BY 1
            ), pairs AS (
              SELECT tg.doc_id AS train_id, eg.doc_id AS eval_id,
                     count(*) AS n_common
              FROM tg JOIN eg USING (gram)
              GROUP BY 1, 2
            )
            SELECT p.train_id, p.eval_id, p.n_common,
                   round(100.0 * p.n_common / (ts.n + es.n - p.n_common), 6)
                     AS jaccard
            FROM pairs p
            JOIN ts ON p.train_id = ts.doc_id
            JOIN es ON p.eval_id = es.doc_id
            WHERE 100.0 * p.n_common / (ts.n + es.n - p.n_common) >= 60.0
        """,
        "retention_events": """
            WITH act AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
              FROM events
            ), coh AS (
              SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1
            )
            SELECT coh.cohort_day,
                   (act.day - coh.cohort_day) AS day_offset,
                   count(*)::BIGINT AS n_users
            FROM act JOIN coh USING (user_id)
            GROUP BY 1, 2
        """,
        "funnel_events": """
            -- greedy earliest-completion ordered funnel, strict ts order
            WITH s1 AS (
              SELECT user_id, min(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY 1
            ), s2 AS (
              SELECT e.user_id, min(e.ts) AS t2
              FROM events e JOIN s1 USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
            ), s3 AS (
              SELECT e.user_id, min(e.ts) AS t3
              FROM events e JOIN s2 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
            )
            SELECT s1.user_id,
                   (1 + (s2.user_id IS NOT NULL)::INT
                      + (s3.user_id IS NOT NULL)::INT)::BIGINT
                     AS steps_completed
            FROM s1
            LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
        """,
        "contamination_docs": """
            -- eval = middle ~30% slice of every 11th doc (embedded
            -- contamination); score = eval-side gram containment
            WITH ev_raw AS (
              SELECT doc_id,
                     substr(coalesce(text, ''),
                            length(coalesce(text, '')) // 3 + 1,
                            greatest((length(coalesce(text, '')) * 3) // 10,
                                     4)) AS text
              FROM documents WHERE doc_id % 11 = 0
            ), tn AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), en AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(text),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM ev_raw
            ), tg AS (
              SELECT doc_id, unnest(list_distinct(
                CASE WHEN length(nt) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN length(nt) < 4 THEN [nt]
                     ELSE list_transform(generate_series(1, length(nt) - 3),
                                         i -> substr(nt, i, 4))
                END)) AS gram
              FROM tn
            ), eg AS (
              SELECT doc_id, unnest(list_distinct(
                CASE WHEN length(nt) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN length(nt) < 4 THEN [nt]
                     ELSE list_transform(generate_series(1, length(nt) - 3),
                                         i -> substr(nt, i, 4))
                END)) AS gram
              FROM en
            ), es AS (
              SELECT doc_id, count(*) AS n FROM eg GROUP BY 1
            ), pairs AS (
              SELECT tg.doc_id AS train_id, eg.doc_id AS eval_id,
                     count(*) AS n_common
              FROM tg JOIN eg USING (gram)
              GROUP BY 1, 2
            )
            SELECT p.train_id, p.eval_id, p.n_common,
                   round(100.0 * p.n_common / es.n, 6) AS containment
            FROM pairs p JOIN es ON p.eval_id = es.doc_id
            WHERE 100.0 * p.n_common / es.n >= 90.0
        """,
        "embedding_near_dups": """
            SELECT e1.vec_id AS a, e2.vec_id AS b,
                   round(list_cosine_similarity(e1.embedding::DOUBLE[],
                                                e2.embedding::DOUBLE[]), 6)
                     AS cos_sim
            FROM embeddings e1
            JOIN embeddings e2 ON e1.vec_id < e2.vec_id
            WHERE list_cosine_similarity(e1.embedding::DOUBLE[],
                                         e2.embedding::DOUBLE[]) >= 0.35
        """,
        "semantic_decontam_embeddings": """
            SELECT t.vec_id AS train_id, e.vec_id AS eval_id,
                   round(list_cosine_similarity(t.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]), 6)
                     AS cos_sim
            FROM embeddings t
            JOIN embeddings e ON e.vec_id % 5 = 0
            WHERE list_cosine_similarity(t.embedding::DOUBLE[],
                                         e.embedding::DOUBLE[]) >= 0.9
        """,
        "lsh_topk": _lsh_topk_oracle(),
        "ann_topk": """
            WITH sims AS (
              -- DOUBLE[] cast: DuckDB would otherwise compute in float32
              -- while the engine computes in float64
              SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                     list_cosine_similarity(q.embedding::DOUBLE[],
                                            v.embedding::DOUBLE[]) AS sim
              FROM embeddings q, embeddings v
              WHERE q.vec_id < 5
            ), ranked AS (
              SELECT query_id, vec_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, vec_id) AS rnk
              FROM sims
            )
            SELECT query_id, vec_id, round(sim, 4) AS cos_sim
            FROM ranked WHERE rnk <= 10
        """,
        "token_count_docs": f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\S+'))::bigint AS n_ws_tokens,
                   len(regexp_extract_all(text, '{bpe}'))::bigint AS n_bpe_tokens,
                   length(text)::bigint AS n_chars_obs
            FROM documents
        """,
        **_pii_oracles(),
        **_hash_oracles(),
        **_sketch_oracles(),
        "events_in_order_window": """
            SELECT p.event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(p.value * 100) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM events p JOIN events s
              ON p.user_id = s.user_id
             AND s.event_type = 'signup'
             AND p.ts >= s.ts
             AND p.ts < s.ts + INTERVAL 10 MINUTE
            WHERE p.event_type <> 'signup'
            GROUP BY 1
        """,
        "pagerank_lineitem": _pagerank_oracle(),
        "ppr_lineitem": _ppr_oracle(),
        "linear_fit_lineitem": """
            WITH q AS (
              SELECT CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS x,
                     CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                       AS y
              FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
            ), s AS (
              SELECT count(*)::HUGEINT AS n,
                     sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
                     sum(x::HUGEINT * y) AS sxy,
                     sum(x::HUGEINT * x) AS sxx,
                     sum(y::HUGEINT * y) AS syy
              FROM q
            ), d AS (
              SELECT n::BIGINT AS n,
                     (n * sxy - sx * sy)::DOUBLE AS num,
                     (n * sxx - sx * sx)::DOUBLE AS denx,
                     (n * syy - sy * sy)::DOUBLE AS deny,
                     sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
                     n::DOUBLE AS nd
              FROM s
            )
            SELECT n,
                   round(num / denx, 9) AS slope,
                   round((syd - (num / denx) * sxd) / nd, 9) AS intercept,
                   round((num * num) / (denx * deny), 9) AS r2
            FROM d
        """,
        "connected_components_docs": """
            WITH RECURSIVE e AS (
              SELECT doc_id AS a, doc_id + 1 AS b
              FROM documents WHERE doc_id % 7 <> 6
            ), nodes AS (
              SELECT DISTINCT node FROM (
                SELECT a AS node FROM e UNION ALL SELECT b FROM e)
            ), walk(node, r) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT w.node, e.a FROM walk w JOIN e ON e.b = w.r
            )
            SELECT node, min(r)::BIGINT AS component
            FROM walk GROUP BY node
        """,
        "snapshot_diff_docs": """
            WITH old AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 13 = 0 THEN text || ' [stale]'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 17 <> 0
              UNION ALL
              SELECT doc_id + 1000000, 'ghost ' || doc_id
              FROM documents WHERE doc_id % 19 = 0
            )
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.text = n.text THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM old o FULL OUTER JOIN documents n
              ON o.doc_id = n.doc_id
        """,
        "orders_anti_building": """
            SELECT o_orderkey, o_custkey, round(o_totalprice, 2)
                     AS o_totalprice
            FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey
                                AND c.c_mktsegment = 'BUILDING')
        """,
        "approx_quantiles_orders": """
            WITH v AS (
              SELECT o_totalprice::DOUBLE AS x
              FROM orders WHERE o_totalprice IS NOT NULL
            ), s AS (
              SELECT min(x) AS mn, max(x) AS mx, count(*)::BIGINT AS n
              FROM v
            ), bins AS (
              SELECT least(CAST(floor((x - s.mn) * 1024.0 / (s.mx - s.mn))
                                AS BIGINT), 1023) AS bin
              FROM v, s
            ), h AS (
              SELECT bin, count(*)::BIGINT AS c FROM bins GROUP BY bin
            ), cumt AS (
              SELECT bin, sum(c) OVER (ORDER BY bin) AS cum FROM h
            ), qq AS (
              SELECT unnest([0.1::DOUBLE, 0.5::DOUBLE,
                             0.9::DOUBLE, 0.99::DOUBLE]) AS q
            ), sel AS (
              SELECT q.q,
                     (SELECT min(bin) FROM cumt
                      WHERE cum > CAST(floor(q.q * (s.n - 1)) AS BIGINT))
                       AS bin
              FROM qq q, s
            )
            SELECT sel.q AS q,
                   round(s.mn + ((sel.bin + 0.5) * (s.mx - s.mn) / 1024.0),
                         6) AS est
            FROM sel, s
        """,
        "latest_order_per_customer": """
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate, o_orderpriority
            FROM (
              SELECT *, row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders
            ) WHERE rn = 1
        """,
        "quantiles_orders": """
            SELECT o_orderstatus,
                   round(quantile_cont(o_totalprice, 0.25), 6) AS q_25,
                   round(quantile_cont(o_totalprice, 0.50), 6) AS q_50,
                   round(quantile_cont(o_totalprice, 0.75), 6) AS q_75
            FROM orders GROUP BY 1
        """,
        "quantile_filter_docs": """
            SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars,
                round(quantile_cont(n_chars, 0.1)
                      OVER (PARTITION BY source), 6) AS lo,
                round(quantile_cont(n_chars, 0.9)
                      OVER (PARTITION BY source), 6) AS hi
              FROM documents)
            WHERE n_chars >= lo AND n_chars <= hi
        """,
        "rolling_mean_events": """
            SELECT event_id,
                   round(((sum(c) OVER w)::DOUBLE / (count(*) OVER w))
                         / 100.0, 6) AS roll_mean
            FROM (SELECT event_id, user_id, ts,
                         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "interarrival_events": """
            SELECT event_id,
                   epoch_us(ts) - lag(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS delta_us
            FROM events
        """,
        "transitions_events": """
            SELECT src, dst, count(*)::BIGINT AS n
            FROM (SELECT lag(event_type)
                           OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS src,
                         event_type AS dst
                  FROM events)
            WHERE src IS NOT NULL
            GROUP BY src, dst
        """,
        "pca_embeddings": _pca_oracle(),
        "profile_orders": _profile_orders_oracle(),
        "distinct_users_by_type": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_distinct
            FROM events GROUP BY event_type
        """,
        "histogram_orders": """
            WITH c AS (
              SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
              FROM orders
            ), b AS (
              SELECT CASE WHEN c % 2000000 <> 0 AND c < 0
                          THEN c // 2000000 - 1
                          ELSE c // 2000000 END AS bin
              FROM c
            )
            SELECT bin, round((bin * 2000000)::DOUBLE / 100.0, 6) AS lo,
                   count(*)::BIGINT AS n
            FROM b GROUP BY bin
        """,
        "twap_events": """
            WITH c AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts,
                     CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
              FROM events
            ), g AS (
              SELECT user_id, c,
                     lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) - ts AS gap
              FROM c
            ), s AS (
              SELECT user_id, sum(c::HUGEINT * gap) AS s
              FROM g WHERE gap IS NOT NULL GROUP BY user_id
            ), t AS (
              SELECT user_id, max(ts) - min(ts) AS t, count(*) AS n
              FROM c GROUP BY user_id
            )
            SELECT t.user_id,
                   CASE WHEN t.t = 0 THEN NULL
                        ELSE round(((s.s)::DOUBLE / (t.t)::DOUBLE)
                                   / 100.0, 6) END AS twap
            FROM t JOIN s USING (user_id) WHERE t.n >= 2
        """,
        "normalize_docs": r"""
            WITH n AS (
              SELECT doc_id,
                     regexp_replace(
                       regexp_replace(
                         lower(nfc_normalize(coalesce(text, ''))),
                         '\s+', ' ', 'g'),
                       '^ | $', '', 'g') AS text
              FROM documents
            )
            SELECT doc_id, text, length(text)::BIGINT AS n_chars_norm
            FROM n
        """,
        "blocklist_docs": _blocklist_oracle(),
        "resample_events": """
            WITH d AS (
              SELECT user_id,
                     CASE WHEN epoch_us(ts) >= 0
                          THEN epoch_us(ts) // 86400000000
                          ELSE -((-epoch_us(ts) + 86400000000 - 1)
                                 // 86400000000) END AS win
              FROM events
            ), b AS (
              SELECT user_id, min(win) AS lo, max(win) AS hi
              FROM d GROUP BY user_id
            ), g AS (
              SELECT user_id, unnest(generate_series(lo, hi)) AS win
              FROM b
            ), c AS (
              SELECT user_id, win, count(*)::BIGINT AS n_events
              FROM d GROUP BY user_id, win
            )
            SELECT g.user_id, g.win,
                   coalesce(c.n_events, 0)::BIGINT AS n_events
            FROM g LEFT JOIN c USING (user_id, win)
        """,
        "robust_z_events": """
            WITH c AS (
              SELECT event_id, event_type,
                     floor(value * 100.0 + 0.5) AS c
              FROM events
            ), m AS (
              SELECT event_type, quantile_cont(c, 0.5) AS med
              FROM c GROUP BY event_type
            ), a AS (
              SELECT c.event_id, c.event_type, c.c, m.med
              FROM c JOIN m USING (event_type)
            ), s AS (
              SELECT event_type, quantile_cont(abs(c - med), 0.5) AS mad
              FROM a GROUP BY event_type
            )
            SELECT a.event_id, a.event_type,
                   CASE WHEN s.mad = 0 THEN NULL
                        ELSE round((a.c - a.med) / s.mad, 6) END
                     AS robust_z
            FROM a JOIN s USING (event_type)
        """,
        "running_total_events": """
            WITH c AS (
              SELECT event_id, user_id, ts,
                     CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
              FROM events
            )
            SELECT event_id,
                   round((sum(c) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING))::DOUBLE
                         / 100.0, 6) AS run_total
            FROM c
        """,
        "pct_rank_orders": """
            SELECT o_orderkey, o_orderstatus,
                   percent_rank() OVER (PARTITION BY o_orderstatus
                                        ORDER BY o_totalprice)
                     AS pct_rank
            FROM orders
        """,
        "mode_orders": """
            WITH c AS (
              SELECT o_orderstatus, o_orderpriority,
                     count(*)::BIGINT AS n
              FROM orders GROUP BY 1, 2
            ), r AS (
              SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                                           ORDER BY n DESC,
                                                    o_orderpriority ASC)
                          AS rn
              FROM c
            )
            SELECT o_orderstatus, o_orderpriority AS mode_val,
                   n AS n_mode
            FROM r WHERE rn = 1
        """,
        "rolling_active_events": """
            WITH d AS (
              SELECT DISTINCT user_id,
                     CASE WHEN epoch_us(ts) >= 0
                          THEN epoch_us(ts) // 86400000000
                          ELSE -((-epoch_us(ts) + 86400000000 - 1)
                                 // 86400000000) END AS d
              FROM events
            ), b AS (
              SELECT min(d) AS lo, max(d) AS hi FROM d
            ), w AS (
              SELECT unnest(generate_series(lo, hi)) AS day FROM b
            )
            SELECT w.day,
                   (SELECT count(DISTINCT user_id) FROM d
                    WHERE d.d BETWEEN w.day - 6 AND w.day)::BIGINT
                     AS n_active
            FROM w
        """,
        "script_profile_docs": r"""
            WITH b AS (
              SELECT doc_id, coalesce(text, '') AS t FROM documents
            ), c AS (
              SELECT doc_id, length(t)::BIGINT AS n_chars_obs,
                length(regexp_replace(t, '[^A-Za-z]', '', 'g'))::BIGINT
                  AS n_latin,
                length(regexp_replace(t, '[^0-9]', '', 'g'))::BIGINT
                  AS n_digit,
                length(regexp_replace(t, '[^\t\n\x0B\x0C\r ]', '', 'g')
                  )::BIGINT AS n_space,
                length(regexp_replace(t, '[^\x{0400}-\x{04FF}]', '', 'g')
                  )::BIGINT AS n_cyrillic,
                length(regexp_replace(t, '[^\x{4E00}-\x{9FFF}]', '', 'g')
                  )::BIGINT AS n_cjk
              FROM b
            )
            SELECT doc_id, n_chars_obs, n_latin, n_digit, n_space,
                   n_cyrillic, n_cjk,
                   (n_chars_obs - n_latin - n_digit - n_space
                    - n_cyrillic - n_cjk)::BIGINT AS n_other
            FROM c
        """,
        "row_number_orders": """
            SELECT o_orderkey, o_totalprice,
                   row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                     AS rn
            FROM orders
        """,
        "edjoin_part": """
            WITH c AS (
              SELECT a.p_partkey AS x_id, b.p_partkey AS y_id,
                     levenshtein(a.p_name, b.p_name) AS d
              FROM part a JOIN part b
                ON a.p_partkey < b.p_partkey
               AND abs(length(a.p_name) - length(b.p_name)) <= 2
            )
            SELECT x_id, y_id, (d)::BIGINT AS dist FROM c WHERE d <= 2
        """,
        "fs_score_customer": """
            WITH f AS (
              SELECT c_custkey AS id, c_nationkey AS blk,
                     c_mktsegment AS f1,
                     CAST(floor(c_acctbal / (100.0)::DOUBLE) AS BIGINT)
                       AS f2
              FROM customer
            ), nn AS (SELECT count(*) AS n FROM f),
            u1 AS (
              SELECT sum(c*c) AS ssq FROM (
                SELECT count(*) AS c FROM f
                WHERE f1 IS NOT NULL GROUP BY f1)
            ), u2 AS (
              SELECT sum(c*c) AS ssq FROM (
                SELECT count(*) AS c FROM f
                WHERE f2 IS NOT NULL GROUP BY f2)
            ), uv AS (
              SELECT (u1.ssq)::DOUBLE / ((nn.n * nn.n))::DOUBLE AS u1v,
                     (u2.ssq)::DOUBLE / ((nn.n * nn.n))::DOUBLE AS u2v
              FROM u1, u2, nn
            ), w AS (
              SELECT ln((0.9)::DOUBLE) - ln(u1v) AS wa1,
                     ln((1.0)::DOUBLE - (0.9)::DOUBLE)
                       - ln((1.0)::DOUBLE - u1v) AS wd1,
                     ln((0.9)::DOUBLE) - ln(u2v) AS wa2,
                     ln((1.0)::DOUBLE - (0.9)::DOUBLE)
                       - ln((1.0)::DOUBLE - u2v) AS wd2
              FROM uv
            ), s AS (
              SELECT a.id AS x_id, b.id AS y_id,
                     (CASE WHEN a.f1 IS NOT NULL AND a.f1 = b.f1
                           THEN w.wa1 ELSE w.wd1 END)
                     + (CASE WHEN a.f2 IS NOT NULL AND a.f2 = b.f2
                             THEN w.wa2 ELSE w.wd2 END) AS sc
              FROM f a JOIN f b ON a.blk = b.blk AND a.id < b.id, w
            )
            SELECT x_id, y_id,
                   CASE WHEN sc >= 0 THEN floor(sc * 1e6 + 0.5) / 1e6
                        ELSE -floor(-sc * 1e6 + 0.5) / 1e6 END AS score,
                   CASE WHEN sc >= (4.0)::DOUBLE THEN 'match'
                        WHEN sc >= (0.0)::DOUBLE THEN 'possible'
                        ELSE 'nonmatch' END AS decision
            FROM s
        """,
        "em_fs_customer": _em_fs_oracle(n_iter=15),
        "benford_orders": """
            WITH base AS (
              SELECT (o_orderpriority)::VARCHAR AS grp,
                     (floor((o_totalprice)::DOUBLE * (100.0)::DOUBLE
                            + (0.5)::DOUBLE))::BIGINT AS cents
              FROM orders
              WHERE o_orderpriority IS NOT NULL
                AND o_totalprice IS NOT NULL
            ), posv AS (
              SELECT grp, (substr(cents::VARCHAR, 1, 1))::BIGINT AS digit
              FROM base WHERE cents > 0
            ), cells AS (
              SELECT grp, digit, count(*)::BIGINT AS c
              FROM posv GROUP BY 1, 2
            ), gt AS (
              SELECT grp, sum(c)::BIGINT AS n FROM cells GROUP BY grp
            ), digits AS (
              SELECT unnest(generate_series(1, 9)) AS d
            ), grid AS (
              SELECT gt.grp, gt.n, digits.d FROM gt CROSS JOIN digits
            ), contrib AS (
              SELECT grid.grp, grid.d,
                     (coalesce(cells.c, 0))::DOUBLE AS c,
                     (grid.n)::DOUBLE
                       * (ln((1.0)::DOUBLE
                             + (1.0)::DOUBLE / (grid.d)::DOUBLE)
                          / ln((10.0)::DOUBLE)) AS e
              FROM grid
              LEFT JOIN cells ON cells.grp = grid.grp
                             AND cells.digit = grid.d
            ), folded AS (
              SELECT grp,
                     list_sum(list((c - e) * (c - e) / e ORDER BY d))
                       AS s
              FROM contrib GROUP BY grp
            )
            SELECT f.grp, gt.n,
                   floor(f.s * 1000000.0 + 0.5) / 1000000.0 AS chi2
            FROM folded f JOIN gt ON gt.grp = f.grp
        """,
        "ewma_events": """
            WITH e AS (
              SELECT user_id, event_id, ts, (value)::DOUBLE AS x
              FROM events
              WHERE user_id IS NOT NULL AND value IS NOT NULL
            ), f AS (
              SELECT user_id,
                     count(*)::BIGINT AS n,
                     list_reduce(
                       list(x ORDER BY ts, event_id),
                       (s, x) -> (0.2)::DOUBLE * x
                                 + ((1.0)::DOUBLE - (0.2)::DOUBLE) * s
                     ) AS s
              FROM e GROUP BY user_id
            )
            SELECT user_id, n,
                   CASE WHEN s >= 0
                        THEN floor(s * 1000000.0 + 0.5) / 1000000.0
                        ELSE -floor(-s * 1000000.0 + 0.5) / 1000000.0
                   END AS ewma
            FROM f
        """,
        "labelprop_lineitem": _labelprop_oracle(iters=4),
        "match_1to1_part": _match_1to1_oracle(rounds=3),
        "soft_tfidf_part": """
            WITH v AS (
              SELECT DISTINCT p_name AS name FROM part
              WHERE p_name IS NOT NULL AND length(p_name) >= 2
            ), nv AS (
              SELECT count(*)::BIGINT AS n FROM v
            ), tk AS (
              SELECT name,
                     (list_sort(list_distinct(list_filter(
                        string_split(regexp_replace(lower(name),
                                                    '[^a-z0-9]+', ' ',
                                                    'g'), ' '),
                        x -> x <> ''))))[1:16] AS toks
              FROM v
            ), tok AS (
              SELECT name, unnest(toks) AS w FROM tk
            ), df AS (
              SELECT w, count(*)::BIGINT AS df FROM tok GROUP BY w
            ), idf AS (
              SELECT w, ln((1.0)::DOUBLE
                           + (SELECT n FROM nv)::DOUBLE
                             / (df)::DOUBLE) AS idf
              FROM df
            ), wt AS (
              SELECT t.name, t.w, i.idf FROM tok t JOIN idf i USING (w)
            ), nrm AS (
              SELECT name,
                     sqrt(list_reduce(
                       list_prepend((0.0)::DOUBLE,
                                    list(idf * idf ORDER BY w)),
                       (s, x) -> s + x)) AS nrm
              FROM wt GROUP BY name
            ), p AS (
              SELECT a.name AS name_a, b.name AS name_b
              FROM v a JOIN v b
                ON substr(a.name, 1, 2) = substr(b.name, 1, 2)
               AND a.name < b.name
            ), cx AS (
              SELECT p.name_a, p.name_b, wa.w, wa.idf AS idf_a,
                     wb.w AS u, wb.idf AS idf_b,
                     round(100.0 * jaro_winkler_similarity(wa.w, wb.w),
                           6) AS jw
              FROM p
              JOIN wt wa ON wa.name = p.name_a
              JOIN wt wb ON wb.name = p.name_b
            ), best AS (
              SELECT name_a, name_b, w, idf_a, idf_b, jw FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY name_a, name_b, w
                  ORDER BY jw DESC, u ASC) AS rn
                FROM cx
              ) WHERE rn = 1
            ), co AS (
              SELECT b.name_a, b.name_b, b.w,
                     CASE WHEN b.jw >= (90.0)::DOUBLE
                          THEN b.idf_a / na.nrm * (b.idf_b / nb.nrm)
                               * (b.jw / (100.0)::DOUBLE)
                          ELSE (0.0)::DOUBLE END AS c
              FROM best b
              JOIN nrm na ON na.name = b.name_a
              JOIN nrm nb ON nb.name = b.name_b
            ), sc AS (
              SELECT name_a, name_b,
                     list_reduce(
                       list_prepend((0.0)::DOUBLE,
                                    list(c ORDER BY w)),
                       (s, x) -> s + x) * (100.0)::DOUBLE AS s
              FROM co GROUP BY name_a, name_b
            )
            SELECT name_a, name_b,
                   floor(s * 1000000.0 + 0.5) / 1000000.0 AS st_sim
            FROM sc
            WHERE floor(s * 1000000.0 + 0.5) / 1000000.0
                  >= (40.0)::DOUBLE
        """,
        "canopy_part": """
            WITH RECURSIVE base AS (
              SELECT name,
                     list_sort(list_distinct(string_split(name, ' ')))
                       AS toks
              FROM (SELECT DISTINCT p_name AS name FROM part
                    WHERE p_name IS NOT NULL)
            ),
            rt(elem, toks, ctr, member, remaining) AS (
              SELECT name, toks, NULL::VARCHAR, false, true FROM base
              UNION ALL
              SELECT elem, toks, ctr,
                     (len(list_intersect(toks, ctoks)))::DOUBLE
                       / (len(list_distinct(toks || ctoks)))::DOUBLE
                       >= (0.34)::DOUBLE,
                     (len(list_intersect(toks, ctoks)))::DOUBLE
                       / (len(list_distinct(toks || ctoks)))::DOUBLE
                       < (0.75)::DOUBLE
              FROM (
                SELECT elem, toks,
                       first_value(elem) OVER (ORDER BY elem) AS ctr,
                       first_value(toks) OVER (ORDER BY elem) AS ctoks
                FROM rt WHERE remaining
              )
            )
            SELECT elem AS value, ctr AS center FROM rt WHERE member
        """,
        "chao1_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), tok AS (
              SELECT unnest(string_split(nt, ' ')) AS term
              FROM t WHERE len(nt) > 0
            ), c AS (
              SELECT term, count(*)::BIGINT AS n_occ
              FROM tok GROUP BY term
            ), f AS (
              SELECT count(*)::BIGINT AS d,
                     (sum(CASE WHEN n_occ = 1 THEN 1 ELSE 0 END))::BIGINT
                       AS f1,
                     (sum(CASE WHEN n_occ = 2 THEN 1 ELSE 0 END))::BIGINT
                       AS f2
              FROM c
            )
            SELECT coalesce(d, 0) AS n_terms, coalesce(f1, 0) AS f1,
                   coalesce(f2, 0) AS f2,
                   CASE WHEN coalesce(f2, 0) = 0 THEN NULL
                        ELSE floor(((d)::DOUBLE
                                    + (f1)::DOUBLE * (f1)::DOUBLE
                                      / ((2.0)::DOUBLE * (f2)::DOUBLE))
                                   * 1000000.0 + 0.5) / 1000000.0
                   END AS chao1
            FROM f
        """,
        "heaps_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(string_split(nt, ' ')) AS term
              FROM t WHERE len(nt) > 0
            ), fd AS (
              SELECT term, min(doc_id) AS fdoc FROM tok GROUP BY term
            ), newt AS (
              SELECT fdoc AS doc_id, count(*)::BIGINT AS n_new
              FROM fd GROUP BY fdoc
            ), dt AS (
              SELECT doc_id, count(*)::BIGINT AS n_tok
              FROM tok GROUP BY doc_id
            ), j AS (
              SELECT d.doc_id,
                     (coalesce(n.n_new, 0))::BIGINT AS n_new,
                     (coalesce(k.n_tok, 0))::BIGINT AS n_tok
              FROM documents d
              LEFT JOIN newt n ON d.doc_id = n.doc_id
              LEFT JOIN dt k ON d.doc_id = k.doc_id
            )
            SELECT doc_id, n_new, n_tok,
                   (sum(n_new) OVER (ORDER BY doc_id))::BIGINT AS vocab,
                   (sum(n_tok) OVER (ORDER BY doc_id))::BIGINT
                     AS cum_tokens
            FROM j
        """,
        "adamic_adar_lineitem": """
            WITH it AS (
              SELECT DISTINCT l_orderkey AS bk, l_partkey AS itm
              FROM lineitem
              WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
            ), good AS (
              SELECT bk, count(*)::BIGINT AS m FROM it GROUP BY bk
              HAVING count(*) <= 256
            ), kept AS (
              SELECT it.bk, it.itm FROM it JOIN good USING (bk)
            ), w AS (
              SELECT bk,
                     CASE WHEN m >= 2
                          THEN (floor((1000000000.0)::DOUBLE
                                      / ln((m)::DOUBLE)
                                      + (0.5)::DOUBLE))::BIGINT
                          ELSE 0 END AS wu
              FROM good
            ), p AS (
              SELECT a.itm AS item_a, b.itm AS item_b,
                     count(*)::BIGINT AS support,
                     (sum(w.wu))::BIGINT AS aa_units
              FROM kept a
              JOIN kept b ON a.bk = b.bk AND a.itm < b.itm
              JOIN w ON w.bk = a.bk
              GROUP BY 1, 2 HAVING count(*) >= 2
            )
            SELECT (item_a)::BIGINT AS item_a,
                   (item_b)::BIGINT AS item_b,
                   support,
                   floor((aa_units)::DOUBLE / (1000000000.0)::DOUBLE
                         * (1000000.0)::DOUBLE + (0.5)::DOUBLE)
                   / (1000000.0)::DOUBLE AS aa
            FROM p
        """,
        "dedup_keep_best_docs": r"""
            WITH n AS (
              SELECT doc_id, n_chars,
                     regexp_replace(
                       regexp_replace(
                         lower(nfc_normalize(coalesce(text, ''))),
                         '\s+', ' ', 'g'),
                       '^ | $', '', 'g') AS nt
              FROM documents
            )
            SELECT doc_id,
                   first_value(doc_id) OVER (
                     PARTITION BY nt
                     ORDER BY n_chars DESC, doc_id ASC
                   ) AS keeper_id
            FROM n
        """,
        "attribution_first_events": """
            WITH e AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts,
                     (event_type)::VARCHAR AS et
              FROM events
              WHERE user_id IS NOT NULL
                AND (event_type)::VARCHAR IN
                    ('click', 'view', 'purchase')
            ), w AS (
              SELECT user_id, event_id, ts, et,
                     first_value(CASE WHEN et IN ('click', 'view')
                                      THEN event_id END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS src_id,
                     first_value(CASE WHEN et IN ('click', 'view')
                                      THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS src_ts,
                     first_value(CASE WHEN et IN ('click', 'view')
                                      THEN et END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS src_et
              FROM e
            )
            SELECT event_id, user_id, ts AS conv_ts,
                   CASE WHEN src_ts IS NOT NULL
                             AND ts - src_ts <= 604800000000
                        THEN src_id END AS attributed_id,
                   CASE WHEN src_ts IS NOT NULL
                             AND ts - src_ts <= 604800000000
                        THEN src_et END AS attributed_type,
                   CASE WHEN src_ts IS NOT NULL
                             AND ts - src_ts <= 604800000000
                        THEN ts - src_ts END AS lag_us
            FROM w WHERE et = 'purchase'
        """,
        "attribution_events": """
            WITH e AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts,
                     (event_type)::VARCHAR AS et
              FROM events
              WHERE user_id IS NOT NULL
                AND (event_type)::VARCHAR IN
                    ('click', 'view', 'purchase')
            ), w AS (
              SELECT user_id, event_id, ts, et,
                     last_value(CASE WHEN et IN ('click', 'view')
                                     THEN event_id END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS src_id,
                     last_value(CASE WHEN et IN ('click', 'view')
                                     THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS src_ts,
                     last_value(CASE WHEN et IN ('click', 'view')
                                     THEN et END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS src_et
              FROM e
            )
            SELECT event_id, user_id, ts AS conv_ts,
                   CASE WHEN src_ts IS NOT NULL
                             AND ts - src_ts <= 604800000000
                        THEN src_id END AS attributed_id,
                   CASE WHEN src_ts IS NOT NULL
                             AND ts - src_ts <= 604800000000
                        THEN src_et END AS attributed_type,
                   CASE WHEN src_ts IS NOT NULL
                             AND ts - src_ts <= 604800000000
                        THEN ts - src_ts END AS lag_us
            FROM w WHERE et = 'purchase'
        """,
        "interval_union_events": """
            WITH iv AS (
              SELECT user_id, event_id, epoch_us(ts) AS s,
                     epoch_us(ts) + 3600000000 AS e
              FROM events WHERE user_id IS NOT NULL
            ), w AS (
              SELECT user_id, event_id, s, e,
                     max(e) OVER (
                       PARTITION BY user_id
                       ORDER BY s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS pm
              FROM iv
            ), f AS (
              SELECT user_id, event_id, s, e,
                     CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END
                       AS ni
              FROM w
            ), g AS (
              SELECT user_id, s, e,
                     sum(ni) OVER (
                       PARTITION BY user_id
                       ORDER BY s, event_id) AS isl
              FROM f
            )
            SELECT user_id, min(s) AS island_start,
                   max(e) AS island_end, count(*)::BIGINT AS n_events
            FROM g GROUP BY user_id, isl
        """,
        "theil_orders": """
            WITH b AS (
              SELECT o_orderpriority AS g,
                     (floor((o_totalprice)::DOUBLE * (100.0)::DOUBLE
                            + (0.5)::DOUBLE))::BIGINT AS c
              FROM orders
              WHERE o_orderpriority IS NOT NULL
                AND o_totalprice IS NOT NULL
            ), a AS (
              SELECT g, count(*)::BIGINT AS n,
                     (sum((c)::HUGEINT))::HUGEINT AS s
              FROM b GROUP BY g
            ), t AS (
              SELECT b.g, a.n, a.s, b.c,
                     CASE WHEN b.c <= 0 OR a.s <= 0 THEN (0.0)::DOUBLE
                          ELSE (b.c)::DOUBLE / (a.s)::DOUBLE
                               * ln((b.c)::DOUBLE * (a.n)::DOUBLE
                                    / (a.s)::DOUBLE)
                     END AS term
              FROM b JOIN a USING (g)
            ), f AS (
              SELECT g, min(n) AS n, min(s) AS s,
                     list_reduce(
                       list_prepend((0.0)::DOUBLE,
                                    list(term ORDER BY c)),
                       (acc, x) -> acc + x) AS th
              FROM t GROUP BY g
            )
            SELECT g AS o_orderpriority, n,
                   CASE WHEN s <= 0 THEN NULL
                        WHEN th >= 0
                        THEN floor(th * 1000000.0 + 0.5) / 1000000.0
                        ELSE -floor(-th * 1000000.0 + 0.5) / 1000000.0
                   END AS theil
            FROM f
        """,
        "gini_orders": """
            WITH b AS (
              SELECT o_orderpriority AS g,
                     (floor((o_totalprice)::DOUBLE * (100.0)::DOUBLE
                            + (0.5)::DOUBLE))::BIGINT AS c
              FROM orders
              WHERE o_orderpriority IS NOT NULL
                AND o_totalprice IS NOT NULL
            ), r AS (
              SELECT g, c,
                     row_number() OVER (PARTITION BY g ORDER BY c)
                       AS i
              FROM b
            ), a AS (
              SELECT g, count(*)::BIGINT AS n,
                     (sum((c)::HUGEINT))::HUGEINT AS s0,
                     (sum((i)::HUGEINT * (c)::HUGEINT))::HUGEINT AS s1
              FROM r GROUP BY g
            ), d AS (
              SELECT g, n,
                     CASE WHEN s0 <= 0 THEN NULL
                          ELSE (2.0)::DOUBLE * (s1)::DOUBLE
                               / ((n)::DOUBLE * (s0)::DOUBLE)
                               - ((n)::DOUBLE + (1.0)::DOUBLE)
                                 / (n)::DOUBLE
                     END AS v
              FROM a
            )
            SELECT g AS o_orderpriority, n,
                   CASE WHEN v IS NULL THEN NULL
                        WHEN v >= 0
                        THEN floor(v * 1000000.0 + 0.5) / 1000000.0
                        ELSE -floor(-v * 1000000.0 + 0.5) / 1000000.0
                   END AS gini
            FROM d
        """,
        "welch_orders": """
            WITH base AS (
              SELECT o_orderpriority AS g,
                     (o_orderstatus)::VARCHAR AS l,
                     (floor((o_totalprice)::DOUBLE * (100.0)::DOUBLE
                            + (0.5)::DOUBLE))::BIGINT AS c
              FROM orders
              WHERE o_orderpriority IS NOT NULL
                AND o_totalprice IS NOT NULL
                AND (o_orderstatus)::VARCHAR IN ('F', 'O')
            ), agg AS (
              SELECT g, l, count(*)::BIGINT AS n,
                     (sum((c)::HUGEINT))::HUGEINT AS s,
                     (sum((c)::HUGEINT * (c)::HUGEINT))::HUGEINT AS q
              FROM base GROUP BY g, l
            ), j AS (
              SELECT a.g, a.n AS na, b.n AS nb, a.s AS sa, b.s AS sb,
                     a.q AS qa, b.q AS qb
              FROM (SELECT * FROM agg WHERE l = 'F') a
              JOIN (SELECT * FROM agg WHERE l = 'O') b USING (g)
              WHERE a.n >= 2 AND b.n >= 2
            ), d AS (
              SELECT g, na, nb,
                     (sa)::DOUBLE / (na)::DOUBLE AS ma,
                     (sb)::DOUBLE / (nb)::DOUBLE AS mb,
                     ((qa)::DOUBLE - (sa)::DOUBLE * (sa)::DOUBLE
                        / (na)::DOUBLE)
                       / ((na)::DOUBLE - (1.0)::DOUBLE) AS va,
                     ((qb)::DOUBLE - (sb)::DOUBLE * (sb)::DOUBLE
                        / (nb)::DOUBLE)
                       / ((nb)::DOUBLE - (1.0)::DOUBLE) AS vb
              FROM j
            ), e AS (
              SELECT g, na, nb, ma, mb, va, vb,
                     va / (na)::DOUBLE + vb / (nb)::DOUBLE AS se2
              FROM d
            ), f AS (
              SELECT g, na, nb, se2,
                     (ma - mb) / (100.0)::DOUBLE AS md,
                     CASE WHEN se2 <= (0.0)::DOUBLE THEN NULL
                          ELSE (ma - mb) / sqrt(se2) END AS ts,
                     CASE WHEN se2 <= (0.0)::DOUBLE THEN NULL
                          ELSE se2 * se2
                               / ((va / (na)::DOUBLE)
                                    * (va / (na)::DOUBLE)
                                    / ((na)::DOUBLE - (1.0)::DOUBLE)
                                  + (vb / (nb)::DOUBLE)
                                    * (vb / (nb)::DOUBLE)
                                    / ((nb)::DOUBLE - (1.0)::DOUBLE))
                     END AS dfree
              FROM e
            )
            SELECT g AS o_orderpriority, na AS n_a, nb AS n_b,
                   CASE WHEN md >= 0
                        THEN floor(md * 1000000.0 + 0.5) / 1000000.0
                        ELSE -floor(-md * 1000000.0 + 0.5) / 1000000.0
                   END AS mean_diff,
                   CASE WHEN ts IS NULL THEN NULL
                        WHEN ts >= 0
                        THEN floor(ts * 1000000.0 + 0.5) / 1000000.0
                        ELSE -floor(-ts * 1000000.0 + 0.5) / 1000000.0
                   END AS t_stat,
                   CASE WHEN dfree IS NULL THEN NULL
                        WHEN dfree >= 0
                        THEN floor(dfree * 1000000.0 + 0.5) / 1000000.0
                        ELSE -floor(-dfree * 1000000.0 + 0.5)
                             / 1000000.0
                   END AS df
            FROM f
        """,
        "zipf_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), tok AS (
              SELECT unnest(string_split(nt, ' ')) AS term
              FROM t WHERE len(nt) > 0
            ), c AS (
              SELECT term, count(*)::BIGINT AS n_occ FROM tok GROUP BY term
            ), top AS (
              SELECT n_occ,
                     row_number() OVER (ORDER BY n_occ DESC, term ASC) AS r
              FROM c ORDER BY n_occ DESC, term ASC LIMIT 128
            ), p AS (
              SELECT r, ln((r)::DOUBLE) AS x, ln((n_occ)::DOUBLE) AS y
              FROM top
            ), f AS (
              SELECT count(*)::BIGINT AS n,
                     list_reduce(list_prepend((0.0)::DOUBLE,
                                              list(x ORDER BY r)),
                                 (s, v) -> s + v) AS sx,
                     list_reduce(list_prepend((0.0)::DOUBLE,
                                              list(y ORDER BY r)),
                                 (s, v) -> s + v) AS sy,
                     list_reduce(list_prepend((0.0)::DOUBLE,
                                              list(x * y ORDER BY r)),
                                 (s, v) -> s + v) AS sxy,
                     list_reduce(list_prepend((0.0)::DOUBLE,
                                              list(x * x ORDER BY r)),
                                 (s, v) -> s + v) AS sxx
              FROM p
            ), g AS (
              SELECT n,
                     CASE WHEN n < 2
                               OR (n)::DOUBLE * sxx - sx * sx = (0.0)::DOUBLE
                          THEN NULL
                          ELSE ((n)::DOUBLE * sxy - sx * sy)
                               / ((n)::DOUBLE * sxx - sx * sx)
                     END AS slope,
                     sx, sy
              FROM f
            ), h AS (
              SELECT n, slope,
                     CASE WHEN slope IS NULL THEN NULL
                          ELSE (sy - slope * sx) / (n)::DOUBLE
                     END AS icept
              FROM g
            )
            SELECT n AS n_terms,
                   CASE WHEN slope IS NULL THEN NULL
                        WHEN slope >= 0
                        THEN floor(slope * 1000000.0 + 0.5) / 1000000.0
                        ELSE -floor(-slope * 1000000.0 + 0.5) / 1000000.0
                   END AS slope,
                   CASE WHEN icept IS NULL THEN NULL
                        WHEN icept >= 0
                        THEN floor(icept * 1000000.0 + 0.5) / 1000000.0
                        ELSE -floor(-icept * 1000000.0 + 0.5) / 1000000.0
                   END AS intercept
            FROM h
        """,
        "cusum_events": """
            WITH e AS (
              SELECT user_id, event_id, ts, (value)::DOUBLE AS x
              FROM events
              WHERE user_id IS NOT NULL AND value IS NOT NULL
            ), f AS (
              SELECT user_id,
                     count(*)::BIGINT AS n,
                     list_reduce(
                       list_prepend((0.0)::DOUBLE,
                                    list(x ORDER BY ts, event_id)),
                       (s, x) -> greatest((0.0)::DOUBLE,
                                          s + x - (0.0)::DOUBLE
                                            - (0.5)::DOUBLE)
                     ) AS hi,
                     list_reduce(
                       list_prepend((0.0)::DOUBLE,
                                    list(x ORDER BY ts, event_id)),
                       (s, x) -> greatest((0.0)::DOUBLE,
                                          s - x + (0.0)::DOUBLE
                                            - (0.5)::DOUBLE)
                     ) AS lo
              FROM e GROUP BY user_id
            )
            SELECT user_id, n,
                   CASE WHEN hi >= 0
                        THEN floor(hi * 1000000.0 + 0.5) / 1000000.0
                        ELSE -floor(-hi * 1000000.0 + 0.5) / 1000000.0
                   END AS cusum_hi,
                   CASE WHEN lo >= 0
                        THEN floor(lo * 1000000.0 + 0.5) / 1000000.0
                        ELSE -floor(-lo * 1000000.0 + 0.5) / 1000000.0
                   END AS cusum_lo,
                   (CASE WHEN hi > (40.0)::DOUBLE
                              OR lo > (40.0)::DOUBLE
                         THEN 1 ELSE 0 END)::INTEGER AS alarm
            FROM f
        """,
        "psi_orders": """
            WITH base AS (
              SELECT (o_orderpriority)::VARCHAR AS grp,
                     (o_totalprice)::DOUBLE AS x
              FROM orders
              WHERE o_orderpriority IS NOT NULL
                AND o_totalprice IS NOT NULL
            ), binned AS (
              SELECT grp,
                     (least(greatest(
                        floor((x - (0.0)::DOUBLE) * (10.0)::DOUBLE
                              / ((400000.0)::DOUBLE - (0.0)::DOUBLE)),
                        (-1.0)::DOUBLE), (10.0)::DOUBLE)
                      + 1.0)::BIGINT AS bin
              FROM base
            ), cells AS (
              SELECT grp, bin, count(*)::BIGINT AS c
              FROM binned GROUP BY 1, 2
            ), corp AS (
              SELECT bin, sum(c)::BIGINT AS c FROM cells GROUP BY bin
            ), nall AS (SELECT sum(c)::BIGINT AS n FROM cells),
            gt AS (
              SELECT grp, sum(c)::BIGINT AS n FROM cells GROUP BY grp
            ), bins AS (
              SELECT unnest(generate_series(0, 11)) AS bin
            ), grid AS (
              SELECT gt.grp, b.bin, gt.n
              FROM gt CROSS JOIN bins b
            ), contrib AS (
              SELECT grid.grp, grid.bin,
                     ((coalesce(cells.c, 0) + 1))::DOUBLE
                       / ((grid.n + 12))::DOUBLE AS p,
                     ((coalesce(corp.c, 0) + 1))::DOUBLE
                       / ((nall.n + 12))::DOUBLE AS q
              FROM grid
              LEFT JOIN cells ON cells.grp = grid.grp
                             AND cells.bin = grid.bin
              LEFT JOIN corp ON corp.bin = grid.bin
              CROSS JOIN nall
            ), folded AS (
              SELECT grp,
                     list_sum(list((p - q) * ln(p / q) ORDER BY bin))
                       AS s
              FROM contrib GROUP BY grp
            )
            SELECT f.grp, gt.n,
                   CASE WHEN f.s >= 0
                        THEN floor(f.s * 1000000.0 + 0.5) / 1000000.0
                        ELSE -floor(-f.s * 1000000.0 + 0.5) / 1000000.0
                   END AS psi
            FROM folded f JOIN gt ON gt.grp = f.grp
        """,
        "merge_report_part": """
            WITH RECURSIVE c AS (
              SELECT a.p_partkey AS u, b.p_partkey AS v
              FROM part a JOIN part b
                ON a.p_partkey < b.p_partkey
               AND abs(length(a.p_name) - length(b.p_name)) <= 1
               AND levenshtein(a.p_name, b.p_name) <= 1
            ), e AS (
              SELECT u AS a, v AS b FROM c
              UNION ALL SELECT v, u FROM c
            ), walk(node, r) AS (
              SELECT p_partkey, p_partkey FROM part
              UNION
              SELECT w.node, e.a FROM walk w JOIN e ON e.b = w.r
            ), comp AS (
              SELECT node, min(r) AS cluster FROM walk GROUP BY node
            ), lab AS (
              SELECT p.*, comp.cluster FROM part p
              JOIN comp ON comp.node = p.p_partkey
            ), rep AS (
              SELECT cluster, count(*)::BIGINT AS n_members,
                     count(DISTINCT p_brand)::BIGINT AS nd_p_brand,
                     count(DISTINCT p_size)::BIGINT AS nd_p_size,
                     count(DISTINCT p_retailprice)::BIGINT
                       AS nd_p_retailprice
              FROM lab GROUP BY cluster
            )
            SELECT cluster, n_members, nd_p_brand, nd_p_size,
                   nd_p_retailprice,
                   ((CASE WHEN nd_p_brand > 1 THEN 1 ELSE 0 END)
                    + (CASE WHEN nd_p_size > 1 THEN 1 ELSE 0 END)
                    + (CASE WHEN nd_p_retailprice > 1 THEN 1 ELSE 0 END)
                   )::BIGINT AS n_conflict_cols
            FROM rep
        """,
        "monge_elkan_part": """
            WITH f AS (
              SELECT p_partkey AS id, p_brand AS blk,
                     list_filter(string_split(
                       trim(regexp_replace(lower(coalesce(p_name, '')),
                                           '[^a-z0-9]+', ' ', 'g')), ' '),
                       x -> x <> '') AS toks
              FROM part WHERE p_brand IS NOT NULL
            ), g AS (
              SELECT id, blk, toks,
                     least(len(toks), 16)::BIGINT AS n
              FROM f WHERE len(toks) > 0
            ), p AS (
              SELECT a.id AS x_id, b.id AS y_id,
                     a.toks AS ta, b.toks AS tb, a.n AS na, b.n AS nb
              FROM g a JOIN g b ON a.blk = b.blk AND a.id < b.id
            ), jwt AS (
              SELECT x_id, y_id, na, nb, u.i, v.j,
                     floor((100.0 * jaro_winkler_similarity(ta[u.i],
                                                            tb[v.j]))
                           * 1000000.0 + 0.5) / 1000000.0 AS jw6
              FROM p,
                   unnest(generate_series(1, na)) u(i),
                   unnest(generate_series(1, nb)) v(j)
            ), mxa AS (
              SELECT x_id, y_id, i, any_value(na) AS na,
                     max(jw6) AS mx
              FROM jwt GROUP BY x_id, y_id, i
            ), mea AS (
              SELECT x_id, y_id,
                     list_sum(list(mx ORDER BY i))
                       / (any_value(na))::DOUBLE AS me
              FROM mxa GROUP BY x_id, y_id
            ), mxb AS (
              SELECT x_id, y_id, j, any_value(nb) AS nb,
                     max(jw6) AS mx
              FROM jwt GROUP BY x_id, y_id, j
            ), meb AS (
              SELECT x_id, y_id,
                     list_sum(list(mx ORDER BY j))
                       / (any_value(nb))::DOUBLE AS me
              FROM mxb GROUP BY x_id, y_id
            ), sym AS (
              SELECT a.x_id, a.y_id,
                     floor(((a.me + b.me) / (2.0)::DOUBLE)
                           * 1000000.0 + 0.5) / 1000000.0 AS me_sim
              FROM mea a JOIN meb b
                ON a.x_id = b.x_id AND a.y_id = b.y_id
            )
            SELECT x_id, y_id, me_sim FROM sym
            WHERE me_sim >= (90.0)::DOUBLE
        """,
        "fs_tf_customer": """
            WITH f AS (
              SELECT c_custkey AS id, c_nationkey AS blk,
                     c_mktsegment AS f1,
                     CAST(floor(c_acctbal / (100.0)::DOUBLE) AS BIGINT)
                       AS f2
              FROM customer
            ), nn AS (SELECT count(*) AS n FROM f),
            u1 AS (
              SELECT sum(c*c) AS ssq FROM (
                SELECT count(*) AS c FROM f
                WHERE f1 IS NOT NULL GROUP BY f1)
            ), u2 AS (
              SELECT sum(c*c) AS ssq FROM (
                SELECT count(*) AS c FROM f
                WHERE f2 IS NOT NULL GROUP BY f2)
            ), uv AS (
              SELECT (u1.ssq)::DOUBLE / ((nn.n * nn.n))::DOUBLE AS u1v,
                     (u2.ssq)::DOUBLE / ((nn.n * nn.n))::DOUBLE AS u2v
              FROM u1, u2, nn
            ), w AS (
              SELECT ln((1.0)::DOUBLE - (0.9)::DOUBLE)
                       - ln((1.0)::DOUBLE - u1v) AS wd1,
                     ln((1.0)::DOUBLE - (0.9)::DOUBLE)
                       - ln((1.0)::DOUBLE - u2v) AS wd2
              FROM uv
            ), vc1 AS (
              SELECT f1 AS v, count(*)::BIGINT AS c FROM f
              WHERE f1 IS NOT NULL GROUP BY f1
            ), vc2 AS (
              SELECT f2 AS v, count(*)::BIGINT AS c FROM f
              WHERE f2 IS NOT NULL GROUP BY f2
            ), s AS (
              SELECT a.id AS x_id, b.id AS y_id,
                     (CASE WHEN a.f1 IS NOT NULL AND a.f1 = b.f1
                           THEN ln((0.9)::DOUBLE)
                                - (2.0)::DOUBLE
                                  * ln((vc1.c)::DOUBLE / (nn.n)::DOUBLE)
                           ELSE w.wd1 END)
                   + (CASE WHEN a.f2 IS NOT NULL AND a.f2 = b.f2
                           THEN ln((0.9)::DOUBLE)
                                - (2.0)::DOUBLE
                                  * ln((vc2.c)::DOUBLE / (nn.n)::DOUBLE)
                           ELSE w.wd2 END) AS sc
              FROM f a JOIN f b ON a.blk = b.blk AND a.id < b.id
              LEFT JOIN vc1 ON vc1.v = a.f1
              LEFT JOIN vc2 ON vc2.v = a.f2
              CROSS JOIN w CROSS JOIN nn
            )
            SELECT x_id, y_id,
                   CASE WHEN sc >= 0 THEN floor(sc * 1e6 + 0.5) / 1e6
                        ELSE -floor(-sc * 1e6 + 0.5) / 1e6 END AS score,
                   CASE WHEN sc >= (4.0)::DOUBLE THEN 'match'
                        WHEN sc >= (0.0)::DOUBLE THEN 'possible'
                        ELSE 'nonmatch' END AS decision
            FROM s
        """,
        "hybrid_search_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(string_split(nt, ' ')) AS term
              FROM t WHERE len(nt) > 0
            ), qq AS (
              SELECT unnest(['merge', 'scan', 'vector', 'window']) AS term
            ), consts AS (
              SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
                     (SELECT count(*) FROM tok)::DOUBLE AS n_toks
            ), dl AS (
              SELECT doc_id, count(*)::DOUBLE AS dl FROM tok
              GROUP BY doc_id
            ), dfq AS (
              SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
              WHERE term IN (SELECT term FROM qq) GROUP BY term
            ), tf AS (
              SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
              WHERE term IN (SELECT term FROM qq) GROUP BY doc_id, term
            ), bscore AS (
              SELECT tf.doc_id,
                     round(sum(
                       ln((consts.n_docs - dfq.df + 0.5)
                          / (dfq.df + 0.5) + 1.0)
                       * tf.tf * (1.2 + 1.0)
                       / (tf.tf + 1.2 * (1.0 - 0.75
                          + 0.75 * dl.dl
                            / (consts.n_toks / consts.n_docs)))
                     ), 6) AS bm25
              FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id)
              CROSS JOIN consts
              GROUP BY tf.doc_id
            ), lex AS (
              SELECT doc_id AS id,
                     row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
              FROM bscore QUALIFY r <= 20
            ), qv AS (
              SELECT vec_id AS id, i AS dim,
                     CAST(floor((embedding[i])::DOUBLE * 1048576.0 + 0.5)
                          AS HUGEINT) AS q
              FROM embeddings,
                   unnest(generate_series(1, len(embedding))) AS u(i)
            ), nrm AS (SELECT id, sum(q*q) AS nv FROM qv GROUP BY id),
            dotq AS (
              SELECT b.id, sum(a.q * b.q) AS dot
              FROM qv a JOIN qv b ON a.dim = b.dim
              WHERE a.id = 0 AND b.id <> 0
              GROUP BY b.id
            ), sem AS (
              SELECT d.id,
                     row_number() OVER (
                       ORDER BY (d.dot)::DOUBLE
                                / (sqrt((nb.nv)::DOUBLE)
                                   * sqrt((n0.nv)::DOUBLE)) DESC, d.id
                     ) AS r
              FROM dotq d
              JOIN nrm nb ON nb.id = d.id
              JOIN nrm n0 ON n0.id = 0
              WHERE nb.nv > 0 AND n0.nv > 0
              QUALIFY r <= 20
            ), fused AS (
              SELECT coalesce(l.id, s.id) AS id,
                     (CASE WHEN l.r IS NOT NULL
                           THEN (1.0)::DOUBLE / ((60 + l.r))::DOUBLE
                           ELSE (0.0)::DOUBLE END)
                   + (CASE WHEN s.r IS NOT NULL
                           THEN (1.0)::DOUBLE / ((60 + s.r))::DOUBLE
                           ELSE (0.0)::DOUBLE END) AS score
              FROM lex l FULL OUTER JOIN sem s ON l.id = s.id
            )
            SELECT (id)::BIGINT AS id,
                   floor(score * 1000000000.0 + 0.5) / 1000000000.0
                     AS rrf,
                   (row_number() OVER (ORDER BY score DESC, id))::BIGINT
                     AS rank
            FROM fused
        """,
        "top_terms_by_source": """
            WITH t AS (
              SELECT doc_id, source,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents WHERE source IS NOT NULL
            ), tok AS (
              SELECT source AS grp, unnest(string_split(nt, ' ')) AS term
              FROM t WHERE len(nt) > 0
            ), c AS (
              SELECT grp, term, count(*)::BIGINT AS n_occ
              FROM tok GROUP BY 1, 2
            )
            SELECT grp, term, n_occ,
                   row_number() OVER (PARTITION BY grp
                                      ORDER BY n_occ DESC, term)
                     ::BIGINT AS rnk
            FROM c
            QUALIFY rnk <= 10
        """,
        "term_kl_docs": """
            WITH t AS (
              SELECT doc_id, (source)::VARCHAR AS grp,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents WHERE source IS NOT NULL
            ), tok AS (
              SELECT grp, unnest(string_split(nt, ' ')) AS term
              FROM t WHERE len(nt) > 0
            ), c AS (
              SELECT grp, term, count(*)::BIGINT AS n_occ
              FROM tok GROUP BY 1, 2
            ), corp AS (
              SELECT term, sum(n_occ)::BIGINT AS n FROM c GROUP BY term
            ), tot AS (
              SELECT sum(n_occ)::BIGINT AS n FROM c
            ), gtot AS (
              SELECT grp, sum(n_occ)::BIGINT AS n_tokens
              FROM c GROUP BY grp
            ), contrib AS (
              SELECT c.grp, c.term,
                     ((c.n_occ)::DOUBLE / (g.n_tokens)::DOUBLE)
                     * ln(((c.n_occ)::DOUBLE / (g.n_tokens)::DOUBLE)
                          / ((corp.n)::DOUBLE / (tot.n)::DOUBLE)) AS x
              FROM c JOIN gtot g ON g.grp = c.grp
                     JOIN corp ON corp.term = c.term
                     CROSS JOIN tot
            ), folded AS (
              SELECT grp,
                     list_sum(list(x ORDER BY term)) AS kl
              FROM contrib GROUP BY grp
            )
            SELECT g.grp, g.n_tokens,
                   CASE WHEN f.kl >= 0
                        THEN floor(f.kl * 1000000.0 + 0.5) / 1000000.0
                        ELSE -floor(-f.kl * 1000000.0 + 0.5) / 1000000.0
                   END AS kl
            FROM gtot g JOIN folded f ON f.grp = g.grp
        """,
        "q3_shipping": """
            WITH li AS (
              SELECT l_orderkey,
                     CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                     * (100 - CAST(floor(l_discount * 100.0 + 0.5)
                                   AS BIGINT)) AS units
              FROM lineitem
              WHERE epoch_us(l_shipdate) > 899164800000000
            ), o AS (
              SELECT o_orderkey, epoch_us(o_orderdate) AS o_date_us,
                     o_orderpriority
              FROM orders
              WHERE epoch_us(o_orderdate) < 899164800000000
                AND o_custkey IN (
                  SELECT c_custkey FROM customer
                  WHERE c_mktsegment = 'BUILDING')
            ), agg AS (
              SELECT li.l_orderkey AS o_orderkey, o.o_date_us,
                     o.o_orderpriority,
                     sum((li.units)::HUGEINT) AS units
              FROM li JOIN o ON li.l_orderkey = o.o_orderkey
              GROUP BY 1, 2, 3
            )
            SELECT o_orderkey, o_date_us, o_orderpriority,
                   floor((units)::DOUBLE / (10000.0)::DOUBLE
                         * 100.0 + 0.5) / 100.0 AS revenue
            FROM agg
            ORDER BY revenue DESC, o_orderkey LIMIT 10
        """,
        "q5_region_revenue": """
            WITH f AS (
              SELECT n.n_name,
                     CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                     * (100 - CAST(floor(l.l_discount * 100.0 + 0.5)
                                   AS BIGINT)) AS units
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
              WHERE epoch_us(o.o_orderdate) >= 820454400000000
                AND epoch_us(o.o_orderdate) < 852076800000000
                AND c.c_nationkey = s.s_nationkey
                AND r.r_name = 'ASIA'
            )
            SELECT n_name, floor((sum((units)::HUGEINT))::DOUBLE
                                 / (10000.0)::DOUBLE
                                 * 100.0 + 0.5) / 100.0 AS revenue
            FROM f GROUP BY n_name
        """,
        "linkage_eval_customer": """
            WITH f AS (
              SELECT c_custkey AS id, c_nationkey AS blk,
                     c_mktsegment AS f1,
                     CAST(floor(c_acctbal / (100.0)::DOUBLE) AS BIGINT)
                       AS f2
              FROM customer
            ), nn AS (SELECT count(*) AS n FROM f),
            u1 AS (
              SELECT sum(c*c) AS ssq FROM (
                SELECT count(*) AS c FROM f
                WHERE f1 IS NOT NULL GROUP BY f1)
            ), u2 AS (
              SELECT sum(c*c) AS ssq FROM (
                SELECT count(*) AS c FROM f
                WHERE f2 IS NOT NULL GROUP BY f2)
            ), uv AS (
              SELECT (u1.ssq)::DOUBLE / ((nn.n * nn.n))::DOUBLE AS u1v,
                     (u2.ssq)::DOUBLE / ((nn.n * nn.n))::DOUBLE AS u2v
              FROM u1, u2, nn
            ), w AS (
              SELECT ln((0.9)::DOUBLE) - ln(u1v) AS wa1,
                     ln((1.0)::DOUBLE - (0.9)::DOUBLE)
                       - ln((1.0)::DOUBLE - u1v) AS wd1,
                     ln((0.9)::DOUBLE) - ln(u2v) AS wa2,
                     ln((1.0)::DOUBLE - (0.9)::DOUBLE)
                       - ln((1.0)::DOUBLE - u2v) AS wd2
              FROM uv
            ), s AS (
              SELECT a.id AS x_id, b.id AS y_id,
                     (CASE WHEN a.f1 IS NOT NULL AND a.f1 = b.f1
                           THEN w.wa1 ELSE w.wd1 END)
                     + (CASE WHEN a.f2 IS NOT NULL AND a.f2 = b.f2
                             THEN w.wa2 ELSE w.wd2 END) AS sc
              FROM f a JOIN f b ON a.blk = b.blk AND a.id < b.id, w
            ), pred AS (
              SELECT x_id, y_id FROM s WHERE sc >= (2.0)::DOUBLE
            ), tr AS (
              SELECT a.id AS x_id, b.id AS y_id
              FROM f a JOIN f b
                ON a.blk = b.blk AND a.id < b.id
               AND a.f1 IS NOT NULL AND a.f1 = b.f1
            ), cnt AS (
              SELECT
                (SELECT count(*) FROM
                  (SELECT * FROM pred INTERSECT SELECT * FROM tr))
                  ::BIGINT AS tp,
                (SELECT count(*) FROM
                  (SELECT * FROM pred EXCEPT SELECT * FROM tr))
                  ::BIGINT AS fp,
                (SELECT count(*) FROM
                  (SELECT * FROM tr EXCEPT SELECT * FROM pred))
                  ::BIGINT AS fn
            ), pr AS (
              SELECT tp, fp, fn,
                     (tp)::DOUBLE / ((tp + fp))::DOUBLE AS p,
                     (tp)::DOUBLE / ((tp + fn))::DOUBLE AS r
              FROM cnt
            )
            SELECT tp, fp, fn,
                   floor(p * 1000000000.0 + 0.5) / 1000000000.0
                     AS precision,
                   floor(r * 1000000000.0 + 0.5) / 1000000000.0
                     AS recall,
                   floor(((2.0)::DOUBLE * p * r) / (p + r)
                         * 1000000000.0 + 0.5) / 1000000000.0 AS f1
            FROM pr
        """,
        "tfidf_pairs_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(string_split(nt, ' ')) AS term
              FROM t WHERE len(nt) > 0
            ), tf AS (
              SELECT doc_id, term,
                     least(count(*), 4096)::BIGINT AS tf
              FROM tok GROUP BY 1, 2
            ), dfreq AS (
              SELECT term, count(*)::BIGINT AS df
              FROM tf GROUP BY term HAVING count(*) <= 100
            ), nn AS (SELECT count(*)::BIGINT AS n FROM documents),
            w AS (
              SELECT tf.doc_id, tf.term,
                     tf.tf * CAST(floor(
                       (ln(((nn.n + 1))::DOUBLE / ((dfreq.df + 1))::DOUBLE)
                        + (1.0)::DOUBLE) * 1024.0 + 0.5) AS BIGINT) AS w
              FROM tf JOIN dfreq USING (term) CROSS JOIN nn
            ), nrm AS (
              SELECT doc_id, sum((w)::HUGEINT * w) AS n2
              FROM w GROUP BY doc_id
            ), d AS (
              SELECT a.doc_id AS ia, b.doc_id AS ib,
                     sum((a.w)::HUGEINT * b.w) AS dot
              FROM w a JOIN w b
                ON a.term = b.term AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), c AS (
              SELECT ia, ib,
                     (dot)::DOUBLE / (sqrt((na.n2)::DOUBLE)
                                      * sqrt((nb.n2)::DOUBLE)) AS cs
              FROM d JOIN nrm na ON na.doc_id = d.ia
                     JOIN nrm nb ON nb.doc_id = d.ib
            )
            SELECT ia AS a, ib AS b,
                   floor(cs * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
            FROM c WHERE cs >= (0.5)::DOUBLE
        """,
        "dbscan_embeddings": """
            WITH RECURSIVE q AS (
              SELECT vec_id AS id, i AS dim,
                     CAST(floor((embedding[i])::DOUBLE * 1048576.0 + 0.5)
                          AS HUGEINT) AS qv
              FROM embeddings,
                   unnest(generate_series(1, len(embedding))) AS u(i)
            ), nrm AS (SELECT id, sum(qv*qv) AS nv FROM q GROUP BY id),
            d AS (
              SELECT a.id AS ia, b.id AS ib, sum(a.qv * b.qv) AS dot
              FROM q a JOIN q b ON a.dim = b.dim AND a.id < b.id
              GROUP BY 1, 2
            ), e AS (
              SELECT ia, ib
              FROM d JOIN nrm na ON na.id = d.ia
                     JOIN nrm nb ON nb.id = d.ib
              WHERE na.nv > 0 AND nb.nv > 0
                AND (dot)::DOUBLE / (sqrt((na.nv)::DOUBLE)
                                     * sqrt((nb.nv)::DOUBLE))
                    >= (0.35)::DOUBLE
            ), sym AS (
              SELECT ia AS a, ib AS b FROM e
              UNION ALL SELECT ib, ia FROM e
            ), deg AS (
              SELECT a AS id, count(*) AS dg FROM sym GROUP BY a
            ), core AS (
              SELECT em.vec_id AS id
              FROM embeddings em LEFT JOIN deg ON deg.id = em.vec_id
              WHERE coalesce(deg.dg, 0) + 1 >= 3
            ), ce AS (
              SELECT s.a, s.b FROM sym s
              JOIN core ca ON ca.id = s.a JOIN core cb ON cb.id = s.b
            ), walk(node, r) AS (
              SELECT id, id FROM core
              UNION
              SELECT w.node, ce.a FROM walk w JOIN ce ON ce.b = w.r
            ), lbl AS (
              SELECT node, min(r) AS lab FROM walk GROUP BY node
            ), bord AS (
              SELECT s.a AS id, min(l.lab) AS lab
              FROM sym s JOIN core c ON c.id = s.b
                         JOIN lbl l ON l.node = s.b
              WHERE s.a NOT IN (SELECT id FROM core)
              GROUP BY s.a
            )
            SELECT em.vec_id AS vec_id,
                   (coalesce(cl.lab, bl.lab, -1))::BIGINT AS label,
                   (cl.node IS NOT NULL) AS is_core
            FROM embeddings em
            LEFT JOIN lbl cl ON cl.node = em.vec_id
            LEFT JOIN bord bl ON bl.id = em.vec_id
        """,
        "er_pipeline_customer": """
            WITH RECURSIVE f AS (
              SELECT c_custkey AS id, c_nationkey AS blk,
                     c_mktsegment AS f1,
                     CAST(floor(c_acctbal / (100.0)::DOUBLE) AS BIGINT)
                       AS f2
              FROM customer
            ), nn AS (SELECT count(*) AS n FROM f),
            u1 AS (
              SELECT sum(c*c) AS ssq FROM (
                SELECT count(*) AS c FROM f
                WHERE f1 IS NOT NULL GROUP BY f1)
            ), u2 AS (
              SELECT sum(c*c) AS ssq FROM (
                SELECT count(*) AS c FROM f
                WHERE f2 IS NOT NULL GROUP BY f2)
            ), uv AS (
              SELECT (u1.ssq)::DOUBLE / ((nn.n * nn.n))::DOUBLE AS u1v,
                     (u2.ssq)::DOUBLE / ((nn.n * nn.n))::DOUBLE AS u2v
              FROM u1, u2, nn
            ), w AS (
              SELECT ln((0.9)::DOUBLE) - ln(u1v) AS wa1,
                     ln((1.0)::DOUBLE - (0.9)::DOUBLE)
                       - ln((1.0)::DOUBLE - u1v) AS wd1,
                     ln((0.9)::DOUBLE) - ln(u2v) AS wa2,
                     ln((1.0)::DOUBLE - (0.9)::DOUBLE)
                       - ln((1.0)::DOUBLE - u2v) AS wd2
              FROM uv
            ), s AS (
              SELECT a.id AS x_id, b.id AS y_id,
                     (CASE WHEN a.f1 IS NOT NULL AND a.f1 = b.f1
                           THEN w.wa1 ELSE w.wd1 END)
                     + (CASE WHEN a.f2 IS NOT NULL AND a.f2 = b.f2
                             THEN w.wa2 ELSE w.wd2 END) AS sc
              FROM f a JOIN f b ON a.blk = b.blk AND a.id < b.id, w
            ), e0 AS (
              SELECT x_id AS u, y_id AS v FROM s
              WHERE sc >= (4.0)::DOUBLE
            ), e AS (
              SELECT u AS a, v AS b FROM e0
              UNION ALL SELECT v, u FROM e0
            ), walk(node, r) AS (
              SELECT c_custkey, c_custkey FROM customer
              UNION
              SELECT w2.node, e.a FROM walk w2 JOIN e ON e.b = w2.r
            ), comp AS (
              SELECT node, min(r) AS cluster FROM walk GROUP BY node
            ), lab AS (
              SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
                     comp.cluster
              FROM customer c JOIN comp ON comp.node = c.c_custkey
            ), bc AS (
              SELECT cluster, c_mktsegment, count(*) AS c FROM lab
              WHERE c_mktsegment IS NOT NULL GROUP BY 1, 2
            ), mb AS (
              SELECT cluster, c_mktsegment FROM (
                SELECT cluster, c_mktsegment,
                       row_number() OVER (PARTITION BY cluster
                                          ORDER BY c DESC,
                                                   c_mktsegment ASC) AS rn
                FROM bc
              ) WHERE rn = 1
            ), agg AS (
              SELECT cluster, (count(*))::BIGINT AS n_members,
                     max(c_acctbal) AS c_acctbal
              FROM lab GROUP BY 1
            )
            SELECT agg.cluster, agg.n_members, mb.c_mktsegment,
                   agg.c_acctbal
            FROM agg JOIN mb USING (cluster)
        """,
        "cube_orders": """
            SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                   coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                   count(*)::BIGINT AS n,
                   round((sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                                   AS BIGINT)))::DOUBLE / 100.0, 6)
                     AS sum_val
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "window_dedupe_events": """
            SELECT event_id, user_id, event_type, win FROM (
              SELECT event_id, user_id, event_type,
                     epoch_us(ts) // 3600000000 AS win,
                     row_number() OVER (
                       PARTITION BY user_id, event_type,
                                    epoch_us(ts) // 3600000000
                       ORDER BY ts, event_id) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "jw_prefix_part": """
            WITH v AS (
              SELECT DISTINCT p_name AS name FROM part
              WHERE length(p_name) >= 2
            ), p AS (
              SELECT a.name AS name_a, b.name AS name_b,
                     round(100.0 * jaro_winkler_similarity(a.name, b.name),
                           6) AS jw_sim
              FROM v a JOIN v b
                ON substr(a.name, 1, 2) = substr(b.name, 1, 2)
               AND a.name < b.name
            )
            SELECT name_a, name_b, jw_sim FROM p
            WHERE jw_sim >= (75.0)::DOUBLE
        """,
        "compare_vectors_customer": """
            WITH f AS (
              SELECT c_custkey AS id, c_nationkey AS blk, c_name,
                     c_mktsegment, c_acctbal
              FROM customer WHERE c_nationkey IS NOT NULL
            )
            SELECT a.id AS x_id, b.id AS y_id,
                   round(CASE
                     WHEN a.c_name = b.c_name THEN 100.0
                     WHEN greatest(length(a.c_name), length(b.c_name)) = 0
                       THEN 100.0
                     WHEN length(a.c_name) = 0 OR length(b.c_name) = 0
                       THEN 0.0
                     ELSE 100.0 * (1.0
                          - levenshtein(a.c_name, b.c_name)::double
                          / greatest(length(a.c_name), length(b.c_name)))
                   END, 6) AS c_name_lev,
                   (CASE WHEN a.c_mktsegment IS NOT NULL
                         AND a.c_mktsegment = b.c_mktsegment
                         THEN 1 ELSE 0 END)::TINYINT
                     AS c_mktsegment_exact,
                   abs(a.c_acctbal - b.c_acctbal) AS c_acctbal_absdiff
            FROM f a JOIN f b ON a.blk = b.blk AND a.id < b.id
        """,
        "bfs_hops_lineitem": """
            WITH RECURSIVE e AS (
              SELECT l_partkey AS a, l_suppkey + 1000000 AS b
              FROM lineitem
              UNION ALL
              SELECT l_suppkey + 1000000, l_partkey FROM lineitem
            ), walk(node, d) AS (
              SELECT 0::BIGINT, 0::BIGINT
              UNION
              SELECT e.b, w.d + 1 FROM walk w
              JOIN e ON e.a = w.node
              WHERE w.d < 8
            )
            SELECT node, min(d)::BIGINT AS hops
            FROM walk GROUP BY node HAVING min(d) <= 8
        """,
        "token_sort_part": r"""
            WITH v AS (SELECT DISTINCT p_name AS name FROM part),
            tok AS (
              SELECT DISTINCT name, t.tok
              FROM v, unnest(string_split_regex(name, '\s+')) AS t(tok)
              WHERE length(t.tok) > 0
            ), pr AS (
              SELECT DISTINCT a.name AS name_a, b.name AS name_b
              FROM tok a JOIN tok b
                ON a.tok = b.tok AND a.name < b.name
            ), s AS (
              SELECT name_a, name_b,
                     array_to_string(list_sort(
                       string_split_regex(name_a, '\s+')), ' ') AS sa,
                     array_to_string(list_sort(
                       string_split_regex(name_b, '\s+')), ' ') AS sb
              FROM pr
            )
            SELECT name_a, name_b,
                   round(CASE
                     WHEN sa = sb THEN 100.0
                     WHEN greatest(length(sa), length(sb)) = 0 THEN 100.0
                     WHEN length(sa) = 0 OR length(sb) = 0 THEN 0.0
                     ELSE 100.0 * (1.0 - levenshtein(sa, sb)::double
                          / greatest(length(sa), length(sb)))
                   END, 6) AS ts_sim
            FROM s
        """,
        "entropy_customer_segments": """
            WITH c AS (
              SELECT c_nationkey AS grp, c_mktsegment AS v,
                     count(*) AS k
              FROM customer
              WHERE c_nationkey IS NOT NULL
                AND c_mktsegment IS NOT NULL
              GROUP BY 1, 2
            ), a AS (
              SELECT grp, (sum(k))::BIGINT AS n,
                     list_sum(list((k::DOUBLE) * ln(k::DOUBLE)
                                   ORDER BY v)) AS s
              FROM c GROUP BY grp
            )
            SELECT grp, n,
                   floor((ln((n)::DOUBLE) - s / (n)::DOUBLE) * 1e6 + 0.5)
                     / 1e6 AS entropy
            FROM a
        """,
        "next_purchase_asof": """
            SELECT l.event_id, min(r.ts) AS next_purchase_ts
            FROM events l
            LEFT JOIN (SELECT user_id, ts FROM events
                       WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND r.ts >= l.ts
            GROUP BY l.event_id
        """,
        "golden_record_part": """
            WITH RECURSIVE c AS (
              SELECT a.p_partkey AS u, b.p_partkey AS v
              FROM part a JOIN part b
                ON a.p_partkey < b.p_partkey
               AND abs(length(a.p_name) - length(b.p_name)) <= 1
               AND levenshtein(a.p_name, b.p_name) <= 1
            ), e AS (
              SELECT u AS a, v AS b FROM c
              UNION ALL SELECT v, u FROM c
            ), walk(node, r) AS (
              SELECT p_partkey, p_partkey FROM part
              UNION
              SELECT w.node, e.a FROM walk w JOIN e ON e.b = w.r
            ), comp AS (
              SELECT node, min(r) AS cluster FROM walk GROUP BY node
            ), lab AS (
              SELECT p.*, comp.cluster FROM part p
              JOIN comp ON comp.node = p.p_partkey
            ), bc AS (
              SELECT cluster, p_brand, count(*) AS c FROM lab
              WHERE p_brand IS NOT NULL GROUP BY 1, 2
            ), mb AS (
              SELECT cluster, p_brand FROM (
                SELECT cluster, p_brand,
                       row_number() OVER (PARTITION BY cluster
                                          ORDER BY c DESC, p_brand ASC)
                         AS rn
                FROM bc
              ) WHERE rn = 1
            ), agg AS (
              SELECT cluster, (count(*))::BIGINT AS n_members,
                     max(p_retailprice) AS p_retailprice,
                     min(p_size) AS p_size
              FROM lab GROUP BY 1
            )
            SELECT agg.cluster, agg.n_members, mb.p_brand,
                   agg.p_retailprice, agg.p_size
            FROM agg JOIN mb USING (cluster)
        """,
        "blocking_quality_part": """
            WITH tok AS (
              SELECT DISTINCT p_partkey AS id, lower(u.tok) AS tok
              FROM part,
                   unnest(string_split(
                     p_name || ' ' || p_brand || ' ' || p_type, ' '
                   )) AS u(tok)
              WHERE length(u.tok) > 0
            ), e AS (
              SELECT a.id AS x_id, b.id AS y_id, count(*) AS w
              FROM tok a JOIN tok b ON a.tok = b.tok AND a.id < b.id
              GROUP BY 1, 2
            ), t AS (
              SELECT (sum(w))::DOUBLE / (count(*))::DOUBLE AS mw FROM e
            ), cand AS (
              SELECT x_id, y_id FROM e, t WHERE (w)::DOUBLE > t.mw
            ), truth AS (
              SELECT a.p_partkey AS x_id, b.p_partkey AS y_id
              FROM part a JOIN part b
                ON a.p_partkey < b.p_partkey AND a.p_name = b.p_name
            ), m AS (
              SELECT (SELECT count(*) FROM cand) AS nc,
                     (SELECT count(*) FROM truth) AS nt,
                     (SELECT count(*) FROM cand c JOIN truth t2
                        ON c.x_id = t2.x_id AND c.y_id = t2.y_id) AS nh,
                     (SELECT count(*) FROM part) AS n
            ), v AS (
              SELECT nc, nt, nh,
                     (1.0)::DOUBLE - (nc)::DOUBLE
                       / ((n * (n - 1) // 2))::DOUBLE AS rr,
                     (nh)::DOUBLE / (nt)::DOUBLE AS pc_,
                     (nh)::DOUBLE / (nc)::DOUBLE AS pq
              FROM m
            )
            SELECT (nc)::BIGINT AS n_cand, (nt)::BIGINT AS n_truth,
                   (nh)::BIGINT AS n_hit,
                   CASE WHEN rr >= 0 THEN floor(rr * 1e6 + 0.5) / 1e6
                        ELSE -floor(-rr * 1e6 + 0.5) / 1e6 END
                     AS reduction_ratio,
                   CASE WHEN pc_ >= 0 THEN floor(pc_ * 1e6 + 0.5) / 1e6
                        ELSE -floor(-pc_ * 1e6 + 0.5) / 1e6 END
                     AS pairs_completeness,
                   CASE WHEN pq >= 0 THEN floor(pq * 1e6 + 0.5) / 1e6
                        ELSE -floor(-pq * 1e6 + 0.5) / 1e6 END
                     AS pairs_quality
            FROM v
        """,
        "heavy_hitters_orders": """
            WITH nn AS (SELECT count(*) AS n FROM orders),
            c AS (
              SELECT o_custkey AS value, (count(*))::BIGINT AS cnt
              FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
            )
            SELECT value, cnt FROM c, nn WHERE cnt * 1000 > nn.n
        """,
        "corr_lineitem": """
            WITH q AS (
              SELECT l_returnflag AS grp,
                     CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS x,
                     CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                       AS y
              FROM lineitem
              WHERE l_quantity IS NOT NULL
                AND l_extendedprice IS NOT NULL
                AND l_returnflag IS NOT NULL
            ), s AS (
              SELECT grp, count(*)::HUGEINT AS n,
                     sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
                     sum(x::HUGEINT * y) AS sxy,
                     sum(x::HUGEINT * x) AS sxx,
                     sum(y::HUGEINT * y) AS syy
              FROM q GROUP BY grp
            ), d AS (
              SELECT grp, (n)::BIGINT AS n,
                     (n * sxy - sx * sy)::DOUBLE AS num,
                     (n * sxx - sx * sx)::DOUBLE AS denx,
                     (n * syy - sy * sy)::DOUBLE AS deny
              FROM s
            )
            SELECT grp, n, round(num / (sqrt(denx) * sqrt(deny)), 9)
                     AS corr
            FROM d
        """,
        "glm_lineitem": """
            WITH q AS (
              SELECT l_returnflag AS grp,
                     CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS x,
                     CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                       AS y
              FROM lineitem
              WHERE l_quantity IS NOT NULL
                AND l_extendedprice IS NOT NULL
                AND l_returnflag IS NOT NULL
            ), s AS (
              SELECT grp, count(*)::HUGEINT AS n,
                     sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
                     sum(x::HUGEINT * y) AS sxy,
                     sum(x::HUGEINT * x) AS sxx,
                     sum(y::HUGEINT * y) AS syy
              FROM q GROUP BY grp
            ), d AS (
              SELECT grp, n::BIGINT AS n,
                     (n * sxy - sx * sy)::DOUBLE AS num,
                     (n * sxx - sx * sx)::DOUBLE AS denx,
                     (n * syy - sy * sy)::DOUBLE AS deny,
                     sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
                     n::DOUBLE AS nd
              FROM s
            )
            SELECT grp, n,
                   round(num / denx, 9) AS slope,
                   round((syd - (num / denx) * sxd) / nd, 9) AS intercept,
                   round((num * num) / (denx * deny), 9) AS r2
            FROM d
        """,
        "basket_pairs_lineitem": """
            WITH it AS (
              SELECT DISTINCT l_orderkey AS bk, l_partkey AS itm
              FROM lineitem
              WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
            ), good AS (
              SELECT bk FROM it GROUP BY bk HAVING count(*) <= 256
            ), kept AS (
              SELECT it.bk, it.itm FROM it JOIN good USING (bk)
            )
            SELECT a.itm::BIGINT AS item_a, b.itm::BIGINT AS item_b,
                   count(*)::BIGINT AS support
            FROM kept a JOIN kept b ON a.bk = b.bk AND a.itm < b.itm
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "item_cosine_lineitem": """
            WITH it AS (
              SELECT DISTINCT l_orderkey AS bk, l_partkey AS itm
              FROM lineitem
              WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
            ), good AS (
              SELECT bk FROM it GROUP BY bk HAVING count(*) <= 256
            ), kept AS (
              SELECT it.bk, it.itm FROM it JOIN good USING (bk)
            ), nb AS (
              SELECT count(DISTINCT bk)::BIGINT AS n FROM kept
            ), isupp AS (
              SELECT itm, count(*)::BIGINT AS s FROM kept GROUP BY itm
            ), p AS (
              SELECT a.itm AS ia, b.itm AS ib, count(*)::BIGINT AS supp
              FROM kept a JOIN kept b ON a.bk = b.bk AND a.itm < b.itm
              GROUP BY 1, 2 HAVING count(*) >= 3
            )
            SELECT (p.ia)::BIGINT AS item_a, (p.ib)::BIGINT AS item_b,
                   p.supp AS support,
                   floor((p.supp)::DOUBLE
                         / (sqrt((sa.s)::DOUBLE) * sqrt((sb.s)::DOUBLE))
                         * 1000000000.0 + 0.5) / 1000000000.0 AS cosine,
                   floor(((p.supp)::HUGEINT * nb.n)::DOUBLE
                         / ((sa.s)::HUGEINT * sb.s)::DOUBLE
                         * 1000000000.0 + 0.5) / 1000000000.0 AS lift
            FROM p JOIN isupp sa ON sa.itm = p.ia
                   JOIN isupp sb ON sb.itm = p.ib
                   CROSS JOIN nb
        """,
        "band_join_orders": """
            SELECT a.o_orderkey AS x_id, b.o_orderkey AS y_id,
                   abs(a.o_totalprice - b.o_totalprice) AS diff
            FROM orders a JOIN orders b
              ON a.o_orderkey < b.o_orderkey
             AND abs(a.o_totalprice - b.o_totalprice) <= (10.0)::DOUBLE
        """,
        "mutual_nn_embeddings": """
            WITH q AS (
              SELECT vec_id AS id, i AS dim,
                     CAST(floor((embedding[i])::DOUBLE * 1048576.0 + 0.5)
                          AS HUGEINT) AS qv
              FROM embeddings,
                   unnest(generate_series(1, len(embedding))) AS u(i)
            ), nrm AS (SELECT id, sum(qv*qv) AS nv FROM q GROUP BY id),
            d AS (
              SELECT a.id AS ia, b.id AS ib, sum(a.qv * b.qv) AS dot
              FROM q a JOIN q b ON a.dim = b.dim AND a.id <> b.id
              GROUP BY 1, 2
            ), c AS (
              SELECT ia, ib,
                     (dot)::DOUBLE / (sqrt((na.nv)::DOUBLE)
                                      * sqrt((nb.nv)::DOUBLE)) AS cs
              FROM d JOIN nrm na ON na.id = d.ia
                     JOIN nrm nb ON nb.id = d.ib
              WHERE na.nv > 0 AND nb.nv > 0
            ), best AS (
              SELECT ia, ib, cs,
                     row_number() OVER (PARTITION BY ia
                                        ORDER BY cs DESC, ib ASC) AS rn
              FROM c
            )
            SELECT a.ia AS x_id, a.ib AS y_id,
                   CASE WHEN a.cs >= 0 THEN floor(a.cs * 1e6 + 0.5) / 1e6
                        ELSE -floor(-a.cs * 1e6 + 0.5) / 1e6 END
                     AS cos_sim
            FROM best a JOIN best b
              ON a.rn = 1 AND b.rn = 1 AND a.ib = b.ia AND b.ib = a.ia
             AND a.ia < a.ib
        """,
        "metablock_part": """
            WITH tok AS (
              SELECT DISTINCT p_partkey AS id, lower(u.tok) AS tok
              FROM part,
                   unnest(string_split(
                     p_name || ' ' || p_brand || ' ' || p_type, ' '
                   )) AS u(tok)
              WHERE length(u.tok) > 0
            ), e AS (
              SELECT a.id AS x_id, b.id AS y_id,
                     (count(*))::BIGINT AS weight
              FROM tok a JOIN tok b ON a.tok = b.tok AND a.id < b.id
              GROUP BY 1, 2
            ), t AS (
              SELECT (sum(weight))::DOUBLE / (count(*))::DOUBLE AS mw
              FROM e
            )
            SELECT x_id, y_id, weight FROM e, t
            WHERE (weight)::DOUBLE > t.mw
        """,
        "soundex_part": """
            WITH l AS (
              SELECT p_partkey,
                     upper(regexp_replace(coalesce(p_name, ''),
                                          '[^A-Za-z]', '', 'g')) AS ls
              FROM part
            ), d AS (
              SELECT p_partkey, ls,
                     translate(ls, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                               '01230120022455012623010202') AS dg
              FROM l
            ), c AS (
              -- collapse runs per digit (RE2 has no backreferences)
              SELECT p_partkey, ls,
                regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(dg,
                  '0+', '0', 'g'), '1+', '1', 'g'), '2+', '2', 'g'),
                  '3+', '3', 'g'), '4+', '4', 'g'), '5+', '5', 'g'),
                  '6+', '6', 'g') AS cs
              FROM d
            )
            SELECT p_partkey,
                   CASE WHEN ls = '' THEN ''
                        ELSE substr(ls, 1, 1) ||
                             rpad(substr(replace(substr(cs, 2), '0', ''),
                                         1, 3), 3, '0')
                   END AS soundex
            FROM c
        """,
        "pareto_orders": """
            -- skyline replay of the engine's own algorithm: per-x max y,
            -- survive iff y == group max AND y > max over strictly
            -- greater x (equivalent to WHERE NOT EXISTS dominating row)
            WITH g AS (
              SELECT o_totalprice AS x, max(o_orderdate) AS gy
              FROM orders
              WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
              GROUP BY x
            ), p AS (
              SELECT x, gy,
                     max(gy) OVER (ORDER BY x DESC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS prev
              FROM g
            )
            SELECT a.* FROM orders a JOIN p ON a.o_totalprice = p.x
            WHERE a.o_orderdate = p.gy
              AND (p.prev IS NULL OR a.o_orderdate > p.prev)
        """,
        "snm_pairs_customer": """
            WITH r AS (
              SELECT c_custkey AS id,
                     row_number() OVER (ORDER BY c_name, c_custkey) AS rn
              FROM customer
            )
            SELECT a.id AS x_id, b.id AS y_id,
                   (b.rn - a.rn)::BIGINT AS gap
            FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4
        """,
        "seq_pattern_events": """
            WITH c AS (
              SELECT user_id, ts, event_id,
                     CASE event_type
                          WHEN 'click' THEN 'c' WHEN 'error' THEN 'e'
                          WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                          WHEN 'view' THEN 'v' END AS ch
              FROM events
              WHERE event_type IN
                    ('click', 'error', 'purchase', 'signup', 'view')
            ), s AS (
              SELECT user_id,
                     string_agg(ch, '' ORDER BY ts, event_id) AS seq
              FROM c GROUP BY user_id
            )
            SELECT user_id, length(seq)::BIGINT AS seq_len,
                   len(regexp_extract_all(seq, 'c+p'))::BIGINT
                     AS n_matches
            FROM s
        """,
        "explode_embeddings": """
            SELECT vec_id, i - 1 AS pos, (embedding[i])::DOUBLE AS val
            FROM embeddings,
                 unnest(generate_series(1, len(embedding))) AS u(i)
        """,
        "centroid_cosine_embeddings": """
            WITH q AS (
              SELECT label, i AS dim,
                     CAST(floor((embedding[i])::DOUBLE * 1048576.0 + 0.5)
                          AS HUGEINT) AS qv
              FROM embeddings,
                   unnest(generate_series(1, len(embedding))) AS u(i)
            ), s AS (
              SELECT label, dim, sum(qv) AS sv FROM q GROUP BY label, dim
            ), d AS (
              SELECT a.label AS label_a, b.label AS label_b,
                     sum(a.sv * b.sv) AS dot
              FROM s a JOIN s b ON a.dim = b.dim AND a.label <= b.label
              GROUP BY 1, 2
            ), n AS (
              SELECT label, sum(sv * sv) AS nrm FROM s GROUP BY label
            ), x AS (
              SELECT d.label_a, d.label_b,
                     (d.dot)::DOUBLE / (sqrt((na.nrm)::DOUBLE)
                                        * sqrt((nb.nrm)::DOUBLE)) AS c
              FROM d
              JOIN n na ON na.label = d.label_a
              JOIN n nb ON nb.label = d.label_b
            )
            SELECT label_a, label_b,
                   CASE WHEN c >= 0 THEN floor(c * 1e6 + 0.5) / 1e6
                        ELSE -floor(-c * 1e6 + 0.5) / 1e6 END AS cos_sim
            FROM x
        """,
        "triangles_orders": """
            WITH raw AS (
              SELECT (o_orderkey % 512) AS u, (o_custkey % 512) AS v
              FROM orders
            ), e AS (
              SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
              FROM raw WHERE u <> v
            )
            SELECT
              (SELECT count(DISTINCT x) FROM
                 (SELECT a AS x FROM e UNION ALL SELECT b FROM e)
              )::BIGINT AS n_nodes,
              (SELECT count(*) FROM e)::BIGINT AS n_edges,
              (SELECT count(*)
               FROM e e1
               JOIN e e2 ON e2.a = e1.b
               JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
              )::BIGINT AS n_triangles
        """,
        "char_entropy_docs": r"""
            WITH base AS (
              SELECT doc_id, coalesce(text, '') AS t FROM documents
            ), ch AS (
              SELECT doc_id, unnest(regexp_split_to_array(t, '')) AS c
              FROM base WHERE length(t) > 0
            ), cnt AS (
              SELECT doc_id, c, count(*)::BIGINT AS k
              FROM ch GROUP BY doc_id, c
            ), agg AS (
              SELECT doc_id, (sum(k))::BIGINT AS n,
                     count(*)::BIGINT AS n_distinct,
                     list_sum(list((k::DOUBLE) * ln(k::DOUBLE) ORDER BY c))
                       AS s
              FROM cnt GROUP BY doc_id
            )
            SELECT b.doc_id,
                   coalesce(a.n, 0)::BIGINT AS n_chars_obs,
                   coalesce(a.n_distinct, 0)::BIGINT AS n_distinct_chars,
                   CASE WHEN a.n IS NULL THEN NULL
                        ELSE floor((ln((a.n)::DOUBLE)
                                    - a.s / (a.n)::DOUBLE) * 1e6 + 0.5)
                             / 1e6 END AS char_entropy
            FROM base b LEFT JOIN agg a USING (doc_id)
        """,
        "intervals_events": """
            WITH o AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts, event_type,
                     lag(event_type)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS prev
              FROM events
            ), runs AS (
              SELECT user_id, event_id, ts, event_type
              FROM o WHERE prev IS DISTINCT FROM event_type
            )
            SELECT user_id, event_type AS val, ts AS valid_from,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS valid_to
            FROM runs
        """,
        "pivot_orders": """
            SELECT o_orderstatus,
                   count(*) FILTER (WHERE o_orderpriority = '1-URGENT'
                                    )::BIGINT AS n_1_urgent,
                   count(*) FILTER (WHERE o_orderpriority = '2-HIGH'
                                    )::BIGINT AS n_2_high,
                   count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM'
                                    )::BIGINT AS n_3_medium,
                   count(*) FILTER (WHERE o_orderpriority IS NULL OR
                                    o_orderpriority NOT IN
                                    ('1-URGENT', '2-HIGH', '3-MEDIUM')
                                    )::BIGINT AS n_other
            FROM orders GROUP BY o_orderstatus
        """,
        "ntile_orders": """
            WITH c AS (
              SELECT o_orderkey, o_orderstatus,
                     CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
              FROM orders
            )
            SELECT o_orderkey,
                   ntile(4) OVER (PARTITION BY o_orderstatus
                                  ORDER BY c, o_orderkey)::BIGINT AS tile
            FROM c
        """,
        "zscore_events": """
            WITH c AS (
              SELECT event_id, event_type,
                     CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
              FROM events
            ), m AS (
              SELECT event_type, count(*) AS n,
                     sum(c) AS s1, sum(c * c) AS s2
              FROM c GROUP BY 1
            )
            SELECT event_id, c.event_type,
                   CASE WHEN n < 2 OR n * s2 - s1 * s1 = 0 THEN NULL
                        ELSE round(((c.c)::DOUBLE
                                    - (s1)::DOUBLE / (n)::DOUBLE)
                                   / sqrt(((n * s2 - s1 * s1))::DOUBLE
                                          / ((n)::DOUBLE * (n)::DOUBLE)),
                                   6)
                   END AS z
            FROM c JOIN m USING (event_type)
        """,
        "pmi_cooccurrence_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), tokall AS (
              SELECT doc_id, unnest(string_split(nt, ' ')) AS term
              FROM t WHERE len(nt) > 0
            ), tok AS (
              SELECT DISTINCT doc_id, term FROM tokall
            ), occ AS (
              SELECT term, count(*) AS n_occ FROM tokall GROUP BY term
            ), dfc AS (
              SELECT term, count(*) AS df FROM tok GROUP BY term
            ), top AS (
              SELECT d.term, d.df
              FROM occ o JOIN dfc d USING (term)
              ORDER BY o.n_occ DESC, d.term LIMIT 48
            ), nd AS (
              SELECT count(*) AS n FROM documents
            ), pairs AS (
              SELECT a.term AS x, b.term AS y, count(*)::BIGINT AS n_xy
              FROM tok a JOIN tok b
                ON a.doc_id = b.doc_id AND a.term < b.term
              WHERE a.term IN (SELECT term FROM top)
                AND b.term IN (SELECT term FROM top)
              GROUP BY 1, 2
            )
            SELECT p.x, p.y, p.n_xy,
                   round(ln(((nd.n * p.n_xy))::DOUBLE
                            / ((dx.df * dy.df))::DOUBLE), 6) AS pmi
            FROM pairs p
            CROSS JOIN nd
            JOIN top dx ON p.x = dx.term
            JOIN top dy ON p.y = dy.term
        """,
        "rollup_orders": """
            SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                   coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                   count(*)::BIGINT AS n,
                   round((sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                                   AS BIGINT)))::DOUBLE / 100.0, 6)
                     AS sum_val
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "winsorize_docs": """
            SELECT doc_id, source,
                   least(greatest(n_chars::DOUBLE, lo), hi) AS n_chars
            FROM (
              SELECT doc_id, source, n_chars,
                round(quantile_cont(n_chars, 0.05)
                      OVER (PARTITION BY source), 6) AS lo,
                round(quantile_cont(n_chars, 0.95)
                      OVER (PARTITION BY source), 6) AS hi
              FROM documents)
        """,
        "chunk_docs": __import__(
            "record_matcher_ray.pipelines.chunking", fromlist=["x"]
        ).sql_chunk_documents(size=64, overlap=16),
        "chunk_dedup_docs": f"""
            WITH ch AS ({__import__(
                "record_matcher_ray.pipelines.chunking", fromlist=["x"]
            ).sql_chunk_documents(size=32, overlap=0)}),
            ids AS (
              SELECT ((doc_id)::BIGINT * 1000000 + chunk_id)::BIGINT
                       AS cid,
                     chunk_text
              FROM ch
            ), k AS (
              SELECT cid,
                     min(cid) OVER (PARTITION BY chunk_text) AS keeper
              FROM ids
            )
            SELECT (keeper)::BIGINT AS keeper_id, (cid)::BIGINT AS dup_id
            FROM k WHERE cid <> keeper
        """,
        "hashed_tfidf_docs": _hashed_tfidf_oracle(),
        "inverted_index_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(string_split(nt, ' ')) AS term
              FROM t WHERE len(nt) > 0
            ), pairs AS (
              SELECT DISTINCT doc_id, term FROM tok
            ), r AS (
              SELECT term, doc_id,
                     row_number() OVER (PARTITION BY term
                                        ORDER BY doc_id) AS rn,
                     count(*) OVER (PARTITION BY term) AS df
              FROM pairs
            )
            SELECT term, df::BIGINT AS df, doc_id
            FROM r WHERE df >= 2 AND rn <= 20
        """,
        "top_terms_docs": """
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(string_split(nt, ' ')) AS term
              FROM t WHERE len(nt) > 0
            )
            SELECT term, count(*)::BIGINT AS n_occ,
                   count(DISTINCT doc_id)::BIGINT AS n_docs
            FROM tok GROUP BY term
            ORDER BY n_occ DESC, term LIMIT 100
        """,
        "bm25_docs": """
            -- Okapi/Lucene BM25 (k1=1.2, b=0.75) with
            -- avgdl = total tokens / total documents (empty docs count)
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(string_split(nt, ' ')) AS term
              FROM t WHERE len(nt) > 0
            ), q AS (
              SELECT unnest(['merge', 'scan', 'vector', 'window']) AS term
            ), consts AS (
              SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
                     (SELECT count(*) FROM tok)::DOUBLE AS n_toks
            ), dl AS (
              SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
            ), df AS (
              SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
              WHERE term IN (SELECT term FROM q) GROUP BY term
            ), tf AS (
              SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
              WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
            )
            SELECT tf.doc_id,
                   round(sum(
                     ln((consts.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                     * tf.tf * (1.2 + 1.0)
                     / (tf.tf + 1.2 * (1.0 - 0.75
                        + 0.75 * dl.dl / (consts.n_toks / consts.n_docs)))
                   ), 6) AS bm25
            FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
            CROSS JOIN consts
            GROUP BY tf.doc_id
        """,
        "bm25_topk_docs": """
            SELECT * FROM (
            -- Okapi/Lucene BM25 (k1=1.2, b=0.75) with
            -- avgdl = total tokens / total documents (empty docs count)
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')),
                                         '[^a-z0-9]+', ' ', 'g')) AS nt
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(string_split(nt, ' ')) AS term
              FROM t WHERE len(nt) > 0
            ), q AS (
              SELECT unnest(['merge', 'scan', 'vector', 'window']) AS term
            ), consts AS (
              SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
                     (SELECT count(*) FROM tok)::DOUBLE AS n_toks
            ), dl AS (
              SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
            ), df AS (
              SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
              WHERE term IN (SELECT term FROM q) GROUP BY term
            ), tf AS (
              SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
              WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
            )
            SELECT tf.doc_id,
                   round(sum(
                     ln((consts.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                     * tf.tf * (1.2 + 1.0)
                     / (tf.tf + 1.2 * (1.0 - 0.75
                        + 0.75 * dl.dl / (consts.n_toks / consts.n_docs)))
                   ), 6) AS bm25
            FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
            CROSS JOIN consts
            GROUP BY tf.doc_id
        ) ORDER BY bm25 DESC, doc_id LIMIT 10
        """,
        "pack_docs": """
            -- replay the next-fit recurrence: walk docs in doc_id order,
            -- start a new bin when the running token sum would exceed 512
            -- (an oversize doc occupies a bin alone). bin_id = first doc id.
            WITH RECURSIVE d AS (
              SELECT row_number() OVER (ORDER BY doc_id) AS rn, doc_id,
                     len(regexp_extract_all(text, '\\S+'))::BIGINT AS tok
              FROM documents
            ), nf AS (
              SELECT rn, doc_id, tok, doc_id AS bin_id, tok AS run
              FROM d WHERE rn = 1
              UNION ALL
              SELECT d.rn, d.doc_id, d.tok,
                     CASE WHEN nf.run + d.tok > 512
                          THEN d.doc_id ELSE nf.bin_id END,
                     CASE WHEN nf.run + d.tok > 512
                          THEN d.tok ELSE nf.run + d.tok END
              FROM nf JOIN d ON d.rn = nf.rn + 1
            )
            SELECT bin_id, count(*) AS n_docs,
                   CAST(sum(tok) AS BIGINT) AS total_tokens,
                   -- /512 is a power-of-two division: bit-exact vs numpy
                   least(CAST(sum(tok) AS DOUBLE) / 512, 1.0) AS fill_frac,
                   CAST(sum(tok) AS BIGINT) > 512 AS oversize
            FROM nf GROUP BY 1
        """,
        "quality_docs": f"""
            WITH t AS (
              SELECT doc_id, text,
                     regexp_extract_all(text, '\\S+') AS toks
              FROM documents
            )
            SELECT doc_id,
                   len(toks)::bigint AS n_tokens,
                   round(CASE WHEN len(toks) = 0 THEN 0.0
                         ELSE list_sum(list_transform(toks, x -> length(x)))::double
                              / len(toks) END, 6) AS mean_token_len,
                   round(CASE WHEN len(toks) = 0 THEN 0.0
                         ELSE len(list_filter(toks, x -> lower(x) IN ({stop})))::double
                              / len(toks) END, 6) AS stopword_ratio,
                   round(len(regexp_extract_all(text, '[^\\w\\s]'))::double
                         / greatest(length(text), 1), 6) AS punct_ratio,
                   round(len(regexp_extract_all(text, '[A-Z]'))::double
                         / greatest(length(text), 1), 6) AS upper_ratio
            FROM t
        """,
    }
