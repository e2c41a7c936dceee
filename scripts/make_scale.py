"""Scale up the driver's sf0.1 testdata for PERF-ONLY runs (sf1, sf10...).

The driver ships sf{0.001,0.01,0.1}; the scale audit (SCALE.md,
VERDICT r05 item 5) needs an sf1 run to expose superlinear tails that
sf0.1 hides (prefix-join candidate growth, pagerank iteration cost,
linkage block skew). This replicates each table FACTOR times with
replica-k key offsets, mirroring how a genuinely larger dataset
behaves rather than inflating per-key depth:

- fact/dim keys get a +k*STRIDE offset (joins stay consistent, key
  cardinality scales xFACTOR, per-key row counts stay flat);
- `documents.text` tokens are suffixed ``r<k>`` for k>0, so replica
  vocabularies are disjoint: dup/near-dup/rare-token structure is
  preserved WITHIN each replica (the original rate) and no artificial
  cross-replica near-dup mass appears (10 verbatim copies of each doc
  would square the candidate count — not what a 10x corpus looks like);
- `embeddings.embedding` is rotated by k positions (norm-preserving,
  distribution-preserving, distinct across replicas);
- `events.user_id` gets the offset too (user/topic cardinality scales;
  replica 0 keeps u0..u1499 so bench Get topics still exist);
- `region`/`nation` stay fixed (TPC-H dims don't scale with sf).

Replica 0 is byte-identical to the source, so every sf0.1 result is a
subset. Output is NOT for correctness oracles — perf only.

Usage: python scripts/make_scale.py [out_dir] [factor] [src_dir]
       (defaults: /tmp/sf1 10 /root/testdata/sf0.1)
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

STRIDE = 10_000_000  # > every key max at sf0.1 (orders ~150k)


def union_over_replicas(select_tpl: str, factor: int) -> str:
    return "\nUNION ALL\n".join(select_tpl.format(k=k) for k in range(factor))


def main() -> None:
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = Path(sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1")
    out_dir.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    def emit(table: str, select_tpl: str | None) -> None:
        src_pq = f"read_parquet('{src}/{table}.parquet')"
        if select_tpl is None:  # fixed dim: copy as-is
            sql = f"SELECT * FROM {src_pq}"
        else:
            sql = union_over_replicas(select_tpl.replace("SRC", src_pq), factor)
        con.execute(
            f"COPY ({sql}) TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    emit("region", None)
    emit("nation", None)
    emit(
        "customer",
        f"SELECT c_custkey + {{k}}*{STRIDE} AS c_custkey, "
        "c_name || CASE WHEN {k}=0 THEN '' ELSE ' r' || {k} END AS c_name, "
        "c_nationkey, c_acctbal, c_mktsegment FROM SRC",
    )
    emit(
        "supplier",
        f"SELECT s_suppkey + {{k}}*{STRIDE} AS s_suppkey, "
        "s_name || CASE WHEN {k}=0 THEN '' ELSE ' r' || {k} END AS s_name, "
        "s_nationkey, s_acctbal FROM SRC",
    )
    emit(
        "part",
        f"SELECT p_partkey + {{k}}*{STRIDE} AS p_partkey, p_name, p_brand, "
        "p_type, p_size, p_retailprice FROM SRC",
    )
    emit(
        "orders",
        f"SELECT o_orderkey + {{k}}*{STRIDE} AS o_orderkey, "
        f"o_custkey + {{k}}*{STRIDE} AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority FROM SRC",
    )
    emit(
        "lineitem",
        f"SELECT l_orderkey + {{k}}*{STRIDE} AS l_orderkey, "
        f"l_partkey + {{k}}*{STRIDE} AS l_partkey, "
        f"l_suppkey + {{k}}*{STRIDE} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate FROM SRC",
    )
    emit(
        "events",
        f"SELECT event_id + {{k}}*{STRIDE} AS event_id, ts, "
        f"user_id + {{k}}*{STRIDE} AS user_id, event_type, value, props "
        "FROM SRC",
    )
    emit(
        "documents",
        f"SELECT doc_id + {{k}}*{STRIDE} AS doc_id, "
        "CASE WHEN {k}=0 THEN text ELSE array_to_string("
        "list_transform(string_split(text, ' '), x -> x || 'r{k}'), ' ') "
        "END AS text, lang, source, CAST(length(CASE WHEN {k}=0 THEN text "
        "ELSE array_to_string(list_transform(string_split(text, ' '), "
        "x -> x || 'r{k}'), ' ') END) AS BIGINT) AS n_chars FROM SRC",
    )
    emit(
        "embeddings",
        f"SELECT vec_id + {{k}}*{STRIDE} AS vec_id, "
        "CASE WHEN {k}=0 THEN embedding ELSE "
        "list_concat(embedding[{k}+1:], embedding[1:{k}]) END AS embedding, "
        "label FROM SRC",
    )


if __name__ == "__main__":
    main()
