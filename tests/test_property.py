"""Property-based tests (hypothesis) — the engine's analog of the
reference's fuzzing layer (SURVEY §5, ipc-fuzzing-test.cc).

Spark-free properties run under hypothesis at full example counts; anything
touching the JVM uses a handful of deterministic seeds instead (a Spark job
per example would be minutes, not milliseconds).
"""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from apache_arrow_spark.types import (
    arrow_to_spark_type,
    roundtrip_lossless,
    spark_to_arrow_type,
)

# -- strategy over the arrow type families the mapping supports ------------

primitive_types = st.sampled_from(
    [
        pa.null(), pa.bool_(),
        pa.int8(), pa.int16(), pa.int32(), pa.int64(),
        pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
        pa.float16(), pa.float32(), pa.float64(),
        pa.string(), pa.binary(), pa.date32(), pa.date64(),
        pa.time32("s"), pa.time32("ms"), pa.time64("us"), pa.time64("ns"),
    ]
)
timestamp_types = st.builds(
    pa.timestamp,
    st.sampled_from(["s", "ms", "us", "ns"]),
    tz=st.sampled_from([None, "UTC", "US/Eastern", "Europe/Paris"]),
)
decimal_types = st.builds(
    pa.decimal128,
    st.integers(min_value=1, max_value=38),
    st.integers(min_value=0, max_value=10),
)
fixed_binary = st.builds(pa.binary, st.integers(min_value=1, max_value=128))

flat_types = st.one_of(primitive_types, timestamp_types, decimal_types, fixed_binary)


def nested(children):
    return st.one_of(
        st.builds(pa.list_, children),
        st.builds(
            lambda a, b: pa.struct([pa.field("f0", a), pa.field("f1", b)]),
            children,
            children,
        ),
    )


arrow_types = st.recursive(flat_types, nested, max_leaves=4)


@given(arrow_types)
@settings(max_examples=300, deadline=None)
def test_every_supported_type_maps(at):
    """arrow -> spark never crashes and always yields a Spark type."""
    st_, meta = arrow_to_spark_type(at)
    assert st_ is not None


@given(arrow_types)
@settings(max_examples=300, deadline=None)
def test_metadata_roundtrip_is_exact(at):
    """arrow -> spark(+meta) -> arrow is the identity for every type whose
    scale/unit/width the metadata records (decimal precision>=1, etc.)."""
    if isinstance(at, pa.Decimal128Type) and at.precision < 1:
        return
    assert roundtrip_lossless(at), at


@given(st.sampled_from([pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64()]))
@settings(max_examples=20, deadline=None)
def test_uint_widening_is_strict(at):
    """Every unsigned type widens (never same-width signed reinterpret)."""
    st_, meta = arrow_to_spark_type(at)
    back = spark_to_arrow_type(st_, meta)
    assert back == at
    assert meta["type"] == str(at)


@given(
    st.lists(
        st.one_of(st.none(), st.text(min_size=0, max_size=40)), min_size=0, max_size=50
    )
)
@settings(max_examples=200, deadline=None)
def test_jaccard_python_model(xs):
    """Pure-python model of the shingle pipeline: normalization is
    idempotent and shingle sets are order-insensitive under it."""
    import re

    def norm(t):
        return re.sub(r"\s+", " ", t.lower()).strip()

    def sh(t, k=5):
        t = norm(t)
        return {t[i : i + k] for i in range(max(len(t) - k + 1, 0))}

    for t in xs:
        if t is None:
            continue
        assert norm(norm(t)) == norm(t)
        assert sh(t) == sh(norm(t))


# -- chunking invariants (pure-python mirror fuzzed, Spark spot-checked) ----

def _chunk_count(n: int, chunk: int, stride: int) -> int:
    return 1 if n <= chunk else (n - chunk + stride - 1) // stride + 1


@given(
    n=st.integers(min_value=1, max_value=5000),
    chunk=st.integers(min_value=1, max_value=600),
    data=st.data(),
)
@settings(max_examples=300, deadline=None)
def test_chunk_count_invariants(n, chunk, data):
    stride = data.draw(st.integers(min_value=1, max_value=chunk))
    """The integer chunk-count formula tiles the token stream exactly:
    first chunk starts at 0, last chunk reaches token n-1, no chunk starts
    past the end, consecutive starts advance by stride."""
    k = _chunk_count(n, chunk, stride)
    starts = [i * stride for i in range(k)]
    assert starts[0] == 0
    assert all(s < n for s in starts)                 # no empty chunks
    assert starts[-1] + chunk >= n                    # reaches the end
    if k > 1:
        assert starts[-2] + chunk < n                 # k is minimal


def test_chunk_documents_matches_formula_on_seeds(spark):
    """Spark chunking agrees with the pure formula for a grid of shapes
    (one Spark job for all cases)."""
    from apache_arrow_spark.functions.pipeline import chunk_documents

    cases = [(i, n) for i, n in enumerate([1, 5, 31, 32, 33, 56, 57, 100, 257])]
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n))) for i, n in cases],
        "doc_id bigint, text string",
    )
    out = chunk_documents(docs, chunk_tokens=32, stride=24).collect()
    got = {}
    for r in out:
        got.setdefault(r["id"], []).append((r["chunk_id"], r["n_tokens"]))
    for i, n in cases:
        k = _chunk_count(n, 32, 24)
        chunks = sorted(got[i])
        assert [c for c, _ in chunks] == list(range(k)), (i, n)
        total_covered = chunks[-1][0] * 24 + chunks[-1][1]
        assert total_covered == n, (i, n)  # last chunk ends at token n


# -- winnowing fingerprints: pure-python model of text.winnow_fingerprints --

import hashlib


def _winnow_py(norm: str, k: int = 5, w: int = 4) -> set[int]:
    grams = [norm[i : i + k] for i in range(len(norm) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


@given(
    st.text(alphabet="abcdefg", min_size=0, max_size=60),
    st.text(alphabet="abcdefg", min_size=0, max_size=60),
    st.text(alphabet="hijklmn", min_size=8, max_size=30),  # shared: distinct alphabet
)
@settings(max_examples=200, deadline=None)
def test_winnow_shared_substring_guarantee(prefix, suffix, shared):
    """Schleimer et al. theorem: any shared substring of length >= w+k-1
    yields a shared fingerprint — for ANY surrounding context."""
    a = prefix + shared + suffix
    b = suffix + shared + prefix
    fa, fb = _winnow_py(a), _winnow_py(b)
    assert fa & fb  # len(shared) >= 8 = w+k-1


def test_winnow_spark_matches_python_model(spark):
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.text import gram_hashes, winnow_fingerprints

    texts = ["abcdefghijklmnop", "aaaaaaaabbbbbbbb", "xy", "", "abcde"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i bigint, t string")
    hs = df.select("i", gram_hashes(F.col("t"), 5).alias("hs"))
    got = {
        r.i: set(r.f)
        for r in hs.select("i", winnow_fingerprints(F.col("hs"), 4).alias("f")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _winnow_py(t), t
