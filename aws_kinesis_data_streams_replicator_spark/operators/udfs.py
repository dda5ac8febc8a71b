"""The Python-UDF surface — demonstrated the *right* way.

The engine's rule (north star): built-in JVM expressions first; when
Python is unavoidable, Arrow-batched pandas UDFs, never row-at-a-time.
These operators exist to pin the three shapes down with integer-exact
semantics (so even the Python path is oracle-checkable):

* ``pandas_distinct_words``  — scalar @pandas_udf (vectorized per batch)
* ``user_activity_stats``    — grouped-map applyInPandas (per-key pandas
                               frame; the custom-aggregation escape hatch)
* streaming stateful ops live in streaming/stateful.py
  (applyInPandasWithState)

Scale notes: scalar pandas UDFs stream Arrow batches (default 10k rows)
— constant memory; applyInPandas materializes ONE GROUP per call, so key
cardinality/size must be checked before reaching for it (a hot key with
10 M rows becomes a 10 M-row pandas frame on one executor).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import DoubleType, LongType, StringType


def broadcast_map_udf(bc):
    """Scalar pandas UDF closing over a broadcast dict — the side-table
    lookup pattern for maps too irregular to join (tokenizer vocabs,
    feature-store snapshots).  The broadcast ships once per executor;
    each Arrow batch is one vectorized ``Series.map``.  For a plain
    key→value relation a broadcast JOIN is still the first choice — this
    exists for lookups inside otherwise-Python logic.

    (Factory form: the annotations must resolve in THIS module's
    namespace, where ``pd`` is a global — `pandas_udf` cannot resolve
    ``pd.Series`` hints from modules that import pandas lazily.)"""

    @F.pandas_udf(StringType())
    def lookup(keys: pd.Series) -> pd.Series:
        return keys.map(bc.value)

    return lookup


@F.pandas_udf(LongType())
def pandas_distinct_words(texts: pd.Series) -> pd.Series:
    """Vectorized distinct-word count (Arrow batch in, Arrow batch out)."""
    return texts.str.split(" ").map(lambda t: len(set(t))).astype("int64")


def distinct_words_pandas(documents: DataFrame) -> DataFrame:
    from .util import spread

    return spread(documents).select(
        "doc_id", pandas_distinct_words(F.col("text")).alias("n_distinct_words")
    )


# type OBJECT, not DDL string: workers that unpickle this module's
# globals have no SparkSession to parse DDL with
@F.pandas_udf(DoubleType())
def pandas_median(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (vectorized UDAF): exact median — the mean
    of the two middle int64s is exactly representable in a double."""
    import numpy as np

    return float(np.median(v))


def event_id_median_by_type(events: DataFrame) -> DataFrame:
    # A GROUPED_AGG pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — count rides in a separate agg and
    # joins back on the (tiny) group key.
    med = events.groupBy("event_type").agg(
        pandas_median(F.col("event_id").cast("double")).alias("median_event_id")
    )
    cnt = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    return med.join(cnt, "event_type")


def sign_lsh_all_bands_udf(n_bands: int, band_planes: int, dim: int):
    """Factory: pandas UDF computing ALL banded sign-LSH bucket ids in
    one numpy matmul per Arrow batch.

    The JVM expression form (similarity.sign_lsh_bucket per band) is
    n_bands·band_planes interpreted higher-order ``aggregate(zip_with)``
    passes per row — measured ~6s for 2000×64-dim at 8×8; this matmul
    path is <50ms for the same work (the one place the pandas UDF IS the
    fast path, because Catalyst doesn't codegen higher-order lambdas).
    Same md5 sign family, same int64 arithmetic → bit-identical buckets.
    """
    import hashlib

    import numpy as np

    total = n_bands * band_planes
    signs = np.array(
        [
            [
                1
                if hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0] >= "8"
                else -1
                for d in range(dim)
            ]
            for p in range(total)
        ],
        dtype=np.int64,
    )

    from pyspark.sql.types import ArrayType, StringType as _Str

    @F.pandas_udf(ArrayType(_Str()))
    def all_buckets(qe: pd.Series) -> pd.Series:
        import numpy as _np

        m = _np.array(qe.tolist(), dtype=_np.int64)  # rows × dim
        bits = (m @ signs.T) >= 0  # rows × total planes
        out = [
            [
                "".join(
                    "1" if b else "0"
                    for b in row[band * band_planes : (band + 1) * band_planes]
                )
                for band in range(n_bands)
            ]
            for row in bits
        ]
        return pd.Series(out)

    return all_buckets


@F.pandas_udf(StringType())
def simhash_bits_pandas(hs: pd.Series) -> pd.Series:
    """Arrow twin of functions/hashing.py:simhash_bits — the 32-bit
    SimHash bitstring from an array of md5 hex strings, as ONE
    vectorized numpy pass per Arrow batch (r12, guide §4.2).

    The JVM expression form is 32 interpreted ``filter``+``size``
    passes over the hash array per family (64 for the 64-bit
    fingerprint) — higher-order lambdas get no codegen and no common-
    subexpression elimination, the ``sign_lsh_all_bands_udf``
    rationale.  Bit-identical by construction: bit p is the majority
    of (hex char p >= '8') across the row's hashes, ASCII compare on
    the same lowercase hex — pinned against the JVM expression by
    tests/test_simhash_arrow.py (incl. ties, single-token and
    empty-ish docs).
    """
    import itertools

    import numpy as np

    lens = np.fromiter(
        (0 if a is None else len(a) for a in hs), dtype=np.int64, count=len(hs)
    )
    total = int(lens.sum())
    zero_row = "0" * 32
    if total == 0:
        # size(NULL/empty)*2 > n is never true in the JVM form either
        return pd.Series([zero_row] * len(hs))
    joined = "".join(
        itertools.chain.from_iterable(a for a in hs if a is not None and len(a))
    )
    bits = (
        np.frombuffer(joined.encode("ascii"), dtype=np.uint8).reshape(total, 32)
        >= 0x38
    )
    nz = lens > 0
    nz_lens = lens[nz]
    starts = np.zeros(len(nz_lens), dtype=np.int64)
    np.cumsum(nz_lens[:-1], out=starts[1:])
    cnts = np.add.reduceat(bits, starts, axis=0)  # (#non-empty, 32)
    maj = cnts * 2 > nz_lens[:, None]
    rows = np.where(maj, "1", "0")
    nz_strs = ["".join(r) for r in rows]
    if nz.all():
        return pd.Series(nz_strs)
    out = [zero_row] * len(hs)
    for i, s in zip(np.flatnonzero(nz), nz_strs):
        out[i] = s
    return pd.Series(out)


class TopTokensUDTF:
    """UDTF with ``analyze()``: the output schema (tok_1..tok_k) is
    derived from the CONSTANT k argument at plan time — the polymorphic
    table-function API (Spark 3.5+ static analysis), demoed with
    deterministic semantics: the k lexicographically-smallest distinct
    tokens per document.

    ``analyze`` runs in the driver-side UDTF analyzer process and the
    class is pickled by value, so all imports stay inside the methods.
    """

    @staticmethod
    def analyze(text, k):
        from pyspark.sql.types import LongType, StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if k.value is None or int(k.value) < 1:
            raise ValueError("k must be a positive constant")
        schema = StructType().add("n_tokens", LongType())
        for i in range(int(k.value)):
            schema = schema.add(f"tok_{i + 1}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, k: int):
        toks = sorted(set(text.split(" ")))
        yield tuple(
            [len(toks)] + [toks[i] if i < len(toks) else None for i in range(k)]
        )


class BigramUDTF:
    """Python UDTF: first 5 word-bigrams of a text, with positions.

    UDTFs are row-at-a-time Python — fine for API surface and small
    inputs; at scale the same expansion belongs in explode(transform(...))
    (see functions/hashing.py) or mapInPandas.
    """

    def eval(self, text: str):  # noqa: A002
        toks = text.split(" ")
        for i in range(min(5, len(toks) - 1)):
            yield i + 1, f"{toks[i]} {toks[i + 1]}"


def user_activity_stats(events: DataFrame) -> DataFrame:
    """Per-user custom aggregation in pandas: event count, distinct
    types, and the largest inter-event gap in microseconds (exact int)."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        ts_us = pdf["ts"].sort_values().astype("int64") // 1000  # ns → µs
        gaps = ts_us.diff().dropna()
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "n_types": [pdf["event_type"].nunique()],
                "max_gap_us": [int(gaps.max()) if len(gaps) else None],
            }
        )

    return events.groupBy("user_id").applyInPandas(
        stats, schema="user_id long, n_events long, n_types long, max_gap_us long"
    )


def user_activity_stats_jvm(events: DataFrame) -> DataFrame:
    """Production path for ``user_activity_stats``: identical output,
    pure JVM — ``lag`` window for the inter-event gap, then one hash
    aggregation.

    The pandas grouped-map version above stays as the documented
    applyInPandas surface demo, but it materializes one full user group
    per Python call — a hot user at 100× data is a single-executor OOM,
    and every row crosses the Arrow boundary.  Here the window sorts
    within the user_id shuffle partition (whole-stage codegen, spill-
    safe) and the aggregation is map-side combined; a hot key degrades
    to a big sort, never to an OOM."""
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        events.select("user_id", "event_type", gap_us.alias("_gap_us"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.max("_gap_us").alias("max_gap_us"),
        )
    )


def arrow_byte_stats(documents: DataFrame) -> DataFrame:
    """``mapInArrow`` byte-level document stats — the zero-copy Python
    crossing: RecordBatches flow straight from the JVM into pyarrow
    compute kernels with NO pandas materialization (no object-dtype
    strings, no index), the cheapest possible Python hop for
    byte/buffer-level work like tokenizer byte accounting.

    Every output is a deterministic pyarrow kernel over the batch
    (utf8_length, count_substring) → integer-exact, oracle-checkable.

    Scale notes (100 TB): per-batch narrow map, no shuffle; Arrow batch
    size (spark.sql.execution.arrow.maxRecordsPerBatch) bounds memory.
    Prefer this over mapInPandas whenever the computation is expressible
    in pyarrow kernels — the pandas round-trip for 10k-row string
    batches measured ~2× the kernel cost.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def run(batches):
        for b in batches:
            text = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(pc.binary_length(text), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.count_substring(text, " "), pa.int64()),
                    pc.cast(pc.count_substring(text, "a"), pa.int64()),
                ],
                names=["doc_id", "n_bytes", "n_chars", "n_spaces", "n_a"],
            )

    from .util import spread

    return spread(documents.select("doc_id", "text")).mapInArrow(
        run, schema="doc_id long, n_bytes long, n_chars long, n_spaces long, n_a long"
    )


class UserSummaryUDTF:
    """TABLE-argument UDTF (Spark 4): consumes
    ``TABLE(events) PARTITION BY user_id ORDER BY ts, event_id`` — the
    engine routes each user's rows, in order, through one UDTF instance,
    and ``terminate()`` emits the partition summary.  The SQL-standard
    polymorphic-table-function shape (think MATCH_RECOGNIZE /
    sessionization hooks) as opposed to the per-row lateral UDTFs above.

    Row-at-a-time Python — API-surface demo; the identical output is a
    window + aggregate JVM plan (see the oracle), which is the
    production path at scale.
    """

    def __init__(self):
        self._uid = None
        self._n = 0
        self._first = None
        self._last = None

    def eval(self, row):
        self._uid = row["user_id"]
        self._n += 1
        if self._first is None:
            self._first = row["event_type"]
        self._last = row["event_type"]

    def terminate(self):
        if self._n:
            yield self._uid, self._n, self._first, self._last
