"""Analyzed-plan cache: eliminate the per-process driver constant of the
composed document pipelines.

Problem (measured, BENCH/PLANS.md): composing one per-doctype pipeline
builds a ~10^4-node Catalyst expression tree through ~40k py4j round trips
(~9 s at this box's ~200 us/call localhost latency) and then eagerly
ANALYZES it (~15 s across the select/withColumn calls — classic Datasets
resolve on every transformation). That ~25 s is pure driver-side work,
paid once per submitted job per process, independent of data volume. It
amortizes over a 100 TB run but is paid 13x in a multi-doctype batch and
on every interactive/driver-gate invocation.

Fix: the analyzed plan of a composed pipeline is a LINEAR chain of
Project/Filter nodes over its input. That chain is a pure function of
(pipeline code, parameters, input schema) — so serialize it once and
splice it onto any new input:

- build once: walk the analyzed plan from the output down to the node that
  IS the input's analyzed plan; Java-serialize the chain with the input
  subtree replaced by a ``LocalRelation`` placeholder that carries the
  input's exact output attributes (names + exprIds + types).
- reuse: deserialize the chain, then alias every column of the NEW input
  to the placeholder's name+exprId (one adapter ``Project`` of
  ``Alias(realAttr, name, exprId=placeholderId)``), rebuild the chain
  bottom-up with ``withNewChildren``, and hand the plan to
  ``Dataset.ofRows``. Re-analysis of an already-resolved plan is ~0.5 s;
  the whole hit path is ~2-4 s instead of ~25 s.

Everything here is driver-side plumbing over public Catalyst tree APIs
(``children``/``output``/``withNewChildren``) — the executed plan is
byte-identical to the live-built one (guarded by tests/test_plancache.py
which collects both and compares, and transitively by the driver's
value-hash oracle gate, which runs through this cache).

Staleness safety: the cache key fingerprints the pyspark version, the
package source files, the pipeline parameters, and the input schema. Any
code edit changes the fingerprint -> miss -> transparent live rebuild
(slow but correct) which rewrites the blob. ``tools/gen_plan_cache.py``
regenerates the committed blobs; a failure mode can at worst cost time,
never correctness, and ``SPARK_GRAFT_PLAN_CACHE=0`` disables the whole
mechanism.

Scale note: this is a DRIVER latency optimization only — the distributed
plan, shuffle structure, and executor work are unchanged. At 1000
executors the same ~25 s would stall the whole cluster at submit time, so
the cache matters MORE there, not less.
"""

from __future__ import annotations

import functools
import gzip
import hashlib
import os
import tempfile

from pyspark.sql import DataFrame

_CACHE_ENV = "SPARK_GRAFT_PLAN_CACHE"
_WRITE_ENV = "SPARK_GRAFT_PLAN_CACHE_WRITE"
_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "_plan_cache")

_SOURCE_FILES = [
    # every module whose code feeds the composed pipelines' expression
    # trees — editing any of these must invalidate the cache
    "docprep/pipelines.py",
    "docprep/sidefiles.py",
    "docprep/grammars.py",
    "docprep/citations.py",
    "docprep/scalars.py",
    "docprep/masterinfo.py",
    "docprep/enrich.py",
    "docprep/popular_acts_data.py",
    "textprep.py",
]


@functools.lru_cache(maxsize=1)
def _source_digest() -> str:
    import pyspark

    h = hashlib.sha256()
    h.update(pyspark.__version__.encode())
    base = os.path.dirname(__file__)
    for rel in _SOURCE_FILES:
        p = os.path.join(base, rel)
        try:
            with open(p, "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(b"<missing>")
    return h.hexdigest()


def cache_enabled() -> bool:
    return os.environ.get(_CACHE_ENV, "1") not in ("0", "false", "no")


def _fingerprint(name: str, params: tuple, schema_json: str) -> str:
    h = hashlib.sha256()
    h.update(_source_digest().encode())
    h.update(repr((name, params)).encode())
    h.update(schema_json.encode())
    return h.hexdigest()[:16]


def _cache_path(name: str, fp: str) -> str:
    return os.path.join(_DEFAULT_DIR, f"{name}-{fp}.plan.gz")


def _jfield(jvm, clsname: str):
    return jvm.java.lang.Class.forName(clsname).getField("MODULE$").get(None)


def _one_seq(jvm, x):
    return jvm.PythonUtils.toSeq([x])


def _linear_chain_over(out_plan, input_plan):
    """Walk from ``out_plan`` down single-child links until a node equal to
    ``input_plan``; return the list of chain nodes (top first), or None if
    the plan is not a linear chain over that input (e.g. a join)."""
    chain = []
    node = out_plan
    for _ in range(10_000):
        if node.equals(input_plan):
            return chain
        if node.children().size() != 1:
            return None
        chain.append(node)
        node = node.children().head()
    return None


def _serialize_chain(spark, chain, input_plan) -> bytes:
    jvm = spark._jvm
    placeholder = _jfield(
        jvm, "org.apache.spark.sql.catalyst.plans.logical.LocalRelation$"
    ).apply(input_plan.output())
    newplan = placeholder
    for n in reversed(chain):
        newplan = n.withNewChildren(_one_seq(jvm, newplan))
    bos = jvm.java.io.ByteArrayOutputStream()
    oos = jvm.java.io.ObjectOutputStream(bos)
    oos.writeObject(newplan)
    oos.close()
    return gzip.compress(bytes(bos.toByteArray()), 6)


def _splice(spark, blob: bytes, input_df: DataFrame) -> DataFrame:
    from pyspark.sql.classic.dataframe import DataFrame as CDataFrame

    jvm = spark._jvm
    raw = gzip.decompress(blob)
    bis = jvm.java.io.ByteArrayInputStream(raw)
    ois = jvm.java.io.ObjectInputStream(bis)
    plan = ois.readObject()
    # walk to the LocalRelation placeholder
    chain = []
    node = plan
    while node.children().size() == 1:
        chain.append(node)
        node = node.children().head()
    if node.getClass().getSimpleName() != "LocalRelation":
        raise ValueError("plan cache blob has no LocalRelation placeholder")
    ph_out = node.output()
    ph_attrs = [ph_out.apply(i) for i in range(ph_out.size())]
    in_plan = input_df._jdf.queryExecution().analyzed()
    in_out = in_plan.output()
    real = {}
    for i in range(in_out.size()):
        a = in_out.apply(i)
        real[a.name()] = a
    none_opt = jvm.scala.Option.empty()
    empty_seq = jvm.PythonUtils.toSeq([])
    alias_cls = jvm.org.apache.spark.sql.catalyst.expressions.Alias
    aliases = [
        alias_cls(
            real[pa.name()], pa.name(), pa.exprId(), empty_seq, none_opt,
            empty_seq,
        )
        for pa in ph_attrs
    ]
    adapter = _jfield(
        jvm, "org.apache.spark.sql.catalyst.plans.logical.Project$"
    ).apply(jvm.PythonUtils.toSeq(aliases), in_plan)
    newplan = adapter
    for n in reversed(chain):
        newplan = n.withNewChildren(_one_seq(jvm, newplan))
    jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, newplan
    )
    return CDataFrame(jdf, spark)


def cached_transform(
    name: str,
    params: tuple,
    input_df: DataFrame,
    build_fn,
    cache_dir: str | None = None,
) -> DataFrame:
    """Run ``build_fn(input_df)`` through the analyzed-plan cache.

    Hit: splice the cached chain onto ``input_df`` (no expression
    rebuild, no fresh analysis). Miss: build live, then persist the chain
    if the plan is a linear chain over the input. Any cache failure falls
    back to the live build — the cache can never change results, only
    latency (equality is pinned by tests/test_plancache.py).
    """
    if not cache_enabled():
        return build_fn(input_df)
    spark = input_df.sparkSession
    d = cache_dir or _DEFAULT_DIR
    try:
        schema_json = input_df.schema.json()
        fp = _fingerprint(name, params, schema_json)
        path = _cache_path(name, fp) if cache_dir is None else os.path.join(
            d, f"{name}-{fp}.plan.gz"
        )
        if os.path.exists(path):
            with open(path, "rb") as f:
                return _splice(spark, f.read(), input_df)
    except Exception:
        pass  # corrupt/incompatible blob or splice failure: rebuild live
    out = build_fn(input_df)
    # writes into the COMMITTED default dir are opt-in (the regen tool sets
    # the env) so ad-hoc schemas — test fixtures, exploratory sessions —
    # don't accrete blobs in the repo; an explicit cache_dir always writes
    if cache_dir is None and os.environ.get(_WRITE_ENV) != "1":
        return out
    try:
        in_plan = input_df._jdf.queryExecution().analyzed()
        chain = _linear_chain_over(out._jdf.queryExecution().analyzed(), in_plan)
        if chain is not None:
            blob = _serialize_chain(spark, chain, in_plan)
            os.makedirs(d, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
    except Exception:
        pass  # non-linear plan or read-only checkout: serve the live build
    return out


def plan_cached(name: str):
    """Decorator for ``*_document(df, **kwargs)`` pipeline composers: route
    through :func:`cached_transform` keyed on the keyword parameters.

    Positional params beyond ``df`` are intentionally unsupported (the key
    must capture every behavior-changing argument); all current pipeline
    signatures are (df, *, keyword-defaults) compatible.
    """

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(df, **kwargs):
            params = tuple(sorted(kwargs.items()))
            return cached_transform(
                name, params, df, lambda d: fn(d, **kwargs)
            )

        wrapper.__wrapped__ = fn
        return wrapper

    return deco
