"""Sequence packing: fill fixed-size training contexts from variable-
length chunks with minimal padding waste.

The last mile of a training-data pipeline: given token-counted pieces
(e.g. `text.chunk_documents` output), assign each to a (shard, bin)
so every bin's token total ≤ the context length. Exact global bin
packing is NP-hard and inherently sequential — the scalable shape is
SHARDED GREEDY: a deterministic hash splits the corpus into independent
shards (same md5 bucketing as `sampling.export_shards`), and each shard
packs locally inside one `applyInPandas` call. Shards are the unit of
parallelism — 100 TB packs as thousands of concurrent shard tasks with
no cross-shard coordination, and re-running any shard reproduces its
bins byte-for-byte (md5 order, no RNG).

First-fit-decreasing within a shard gives the classic 11/9·OPT+1 waste
bound; rows longer than `max_tokens` are dropped into single-piece
overflow bins (flagged) rather than silently truncated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SUFFIX = "shard int, bin int, bin_tokens bigint, overflow boolean"


def pack_sequences(
    pieces: DataFrame,
    max_tokens: int,
    len_col: str = "n_chunk_tokens",
    id_cols: tuple[str, ...] = ("doc_id", "chunk_id"),
    num_shards: int = 64,
) -> DataFrame:
    """Assign every piece to (shard, bin) with sum(len) ≤ max_tokens
    per bin. Returns the input columns + (shard, bin, bin_tokens,
    overflow). Deterministic: shard = md5 bucket of the id columns,
    within-shard order = (length desc, ids asc) first-fit."""
    ids = [F.col(c) for c in id_cols]
    key = F.concat_ws("\x1f", *[c.cast("string") for c in ids])
    shard = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % num_shards
    ).cast("int")
    src = pieces.withColumn("_shard", shard)

    in_cols = pieces.columns
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in pieces.schema.fields)
        + ", "
        + _OUT_SUFFIX
    )
    cap = int(max_tokens)
    lcol = len_col
    idl = list(id_cols)

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            by=[lcol, *idl], ascending=[False] + [True] * len(idl)
        ).reset_index(drop=True)
        shard_id = int(pdf["_shard"].iloc[0])
        bins: list[int] = []  # free capacity per bin
        assign: list[int] = []
        overflow: list[bool] = []
        for n in pdf[lcol].astype(int):
            if n > cap:
                bins.append(-1)  # closed overflow bin, single piece
                assign.append(len(bins) - 1)
                overflow.append(True)
                continue
            # first-fit over open bins (lengths are sorted desc, so a
            # linear scan touches few bins in practice)
            for b, free in enumerate(bins):
                if free >= n:
                    bins[b] = free - n
                    assign.append(b)
                    break
            else:
                bins.append(cap - n)
                assign.append(len(bins) - 1)
            overflow.append(False)
        pdf = pdf.drop(columns=["_shard"])
        pdf["shard"] = shard_id
        pdf["bin"] = pd.array(assign, dtype="int32")
        totals = {}
        for b, n in zip(assign, pdf[lcol].astype(int)):
            totals[b] = totals.get(b, 0) + n
        pdf["bin_tokens"] = pd.array([totals[b] for b in assign], dtype="int64")
        pdf["overflow"] = pd.array(overflow, dtype="boolean")
        return pdf[in_cols + ["shard", "bin", "bin_tokens", "overflow"]]

    return src.groupBy("_shard").applyInPandas(pack, out_schema)


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """One-row utilization summary of a pack_sequences result: bins,
    pieces, mean fill ratio, waste fraction (padding / capacity) over
    non-overflow bins."""
    regular = packed.filter(~F.col("overflow"))
    per_bin = regular.groupBy("shard", "bin").agg(
        F.first("bin_tokens").alias("tok")
    )
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.round(F.avg(F.col("tok") / F.lit(float(max_tokens))), 6).alias("mean_fill"),
        F.round(
            1.0 - F.sum("tok") / (F.count(F.lit(1)) * F.lit(float(max_tokens))), 6
        ).alias("waste_frac"),
    )
