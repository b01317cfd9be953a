"""Generate larger scale factors for the SCALING CURVE measurement
(PERF.md) by key-shifted replication of the driver's sf0.1 tables.

The driver's testdata is read-only and capped at sf0.1; the 100x design
claims need at least one measured scale-up ratio (VERDICT r4 item 7).
Replication preserves the base distributions and foreign-key structure
exactly: replica ``r`` shifts every key column by ``r * (max_key + 1)``
consistently across fact and dimension tables, so joins land exactly as
they do at sf0.1, just N times over. Fixed dims (region, nation) copy
once.

Document text is deterministically perturbed per replica (about half the
tokens get a replica-suffixed twin, selection a pure function of the
token, suffix a pure function of the replica) so cross-replica documents
are NOT near-duplicates — shingle survival across replicas is ~12%,
putting cross-replica Jaccard ~0.07, far below every dedup threshold —
while intra-replica near-dup structure is preserved bit-for-bit (two
similar docs in one replica share tokens, hence share perturbations).
Embeddings replicate as-is (ANN/IVF/PQ cost is row-count-driven; replica
0 keeps vec_id 0 so the fixed-query entries run unchanged).

Usage::

    python tools/scale_testdata.py /root/testdata/sf0.1 /tmp/scaledata/sf0.3 3
    python tools/scale_testdata.py /root/testdata/sf0.1 /tmp/scaledata/sf1 10

Output dirs mirror the driver layout (one ``<table>.parquet`` file each)
and are for PERF scaling ratios only — correctness gates keep running on
the driver's own testdata.
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: key columns shifted per replica, per table (consistent across tables)
KEY_GROUPS: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "custkey")],
    "supplier": [("s_suppkey", "suppkey")],
    "part": [("p_partkey", "partkey")],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem": [
        ("l_orderkey", "orderkey"),
        ("l_partkey", "partkey"),
        ("l_suppkey", "suppkey"),
    ],
    "events": [("event_id", "eventid"), ("user_id", "userid")],
    "documents": [("doc_id", "docid")],
    "embeddings": [("vec_id", "vecid")],
}

FIXED_TABLES = ("region", "nation")


def _offsets(src: str) -> dict[str, int]:
    """One shift offset per key GROUP: max over every column that carries
    the group's key, + 1, so replicas never collide."""
    offs: dict[str, int] = {}
    for table, cols in KEY_GROUPS.items():
        t = pq.read_table(
            os.path.join(src, f"{table}.parquet"),
            columns=[c for c, _ in cols],
        )
        for col, group in cols:
            m = pc.max(t.column(col)).as_py() or 0
            offs[group] = max(offs.get(group, 0), int(m) + 1)
    return offs


def _perturb_text(text: str, replica: int) -> str:
    """Deterministic per-replica token perturbation (see module docstring)."""
    out = []
    for tok in text.split(" "):
        sel = hashlib.md5(tok.encode()).digest()[0] & 1
        out.append(f"{tok}x{replica}" if sel else tok)
    return " ".join(out)


def scale_table(
    src: str, dst: str, table: str, replicas: int, offs: dict[str, int]
) -> int:
    t = pq.read_table(os.path.join(src, f"{table}.parquet"))
    if table in FIXED_TABLES:
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return t.num_rows
    parts = []
    for r in range(replicas):
        rep = t
        for col, group in KEY_GROUPS.get(table, []):
            shifted = pc.add(rep.column(col), r * offs[group])
            rep = rep.set_column(
                rep.schema.get_field_index(col),
                rep.schema.field(col),
                shifted.cast(rep.schema.field(col).type),
            )
        if table == "documents" and r > 0:
            texts = pa.array(
                [_perturb_text(v.as_py(), r) for v in rep.column("text")],
                pa.string(),
            )
            i = rep.schema.get_field_index("text")
            rep = rep.set_column(i, rep.schema.field("text"), texts)
        parts.append(rep)
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(dst, f"{table}.parquet"))
    return out.num_rows


def main() -> None:
    src, dst, replicas = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    offs = _offsets(src)
    for table in (*FIXED_TABLES, *KEY_GROUPS):
        n = scale_table(src, dst, table, replicas, offs)
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
