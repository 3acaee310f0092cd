"""Engine-level runtime knobs: durable materialization + conf namespace.

Two concerns every iterative operator in this engine shares:

1. **Lineage truncation that survives executor loss.** The iterative
   operators (connected components, BPE training, PageRank, SemDeDup
   assignment) must materialize intermediate state so downstream stages
   — often *both* sides of a self-join — don't replay the full lineage.
   ``DataFrame.localCheckpoint`` does that cheaply but stores the
   blocks on executor-local disk/memory WITHOUT replication: on a real
   cluster, losing one executor after the checkpoint kills the job
   unrecoverably (the lineage needed to recompute the lost blocks was
   just truncated).  ``materialize`` below picks the right primitive:
   reliable ``checkpoint()`` to a DFS directory when one is configured
   (``spark.xsarsea.checkpoint.dir`` or an already-set
   ``SparkContext.setCheckpointDir``), ``localCheckpoint`` otherwise
   (correct and fastest for single-node test runs).  Results are
   identical either way — only the fault-tolerance story changes.

2. **Tunables without code edits.** Thresholds that a 100×-scale
   operator would want to turn (driver union-find cutoff, tile/halo
   sizes) read from the ``spark.xsarsea.*`` conf namespace with the
   current literals as defaults, so behavior is unchanged unless a
   deployment overrides them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["materialize", "get_conf", "get_conf_int", "CONF_CHECKPOINT_DIR",
           "scratch_path", "CONF_SCRATCH_DIR"]

CONF_CHECKPOINT_DIR = "spark.xsarsea.checkpoint.dir"


def get_conf(spark: SparkSession, key: str, default: str) -> str:
    """Read ``key`` from the session conf, falling back to ``default``.

    All engine tunables live under the ``spark.xsarsea.`` prefix; they
    are runtime-settable (plain conf entries, not SQL confs), so a
    cluster operator can tune them per-job with ``--conf``.
    """
    try:
        v = spark.conf.get(key, None)
    except Exception:
        v = None
    return default if v is None else v


def get_conf_int(spark: SparkSession, key: str, default: int) -> int:
    return int(get_conf(spark, key, str(default)))


def _reliable_dir(spark: SparkSession) -> str | None:
    """The DFS checkpoint directory to use, or None for local mode.

    Priority: an explicitly configured ``spark.xsarsea.checkpoint.dir``
    conf, then a directory already set via ``sc.setCheckpointDir``.
    """
    conf_dir = get_conf(spark, CONF_CHECKPOINT_DIR, "")
    if conf_dir:
        return conf_dir
    try:
        existing = spark.sparkContext.getCheckpointDir()
    except Exception:
        existing = None
    return existing or None


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage, durably when the deployment allows.

    - If a checkpoint directory is available (see ``_reliable_dir``),
      use reliable ``checkpoint()``: blocks go to the DFS, so the job
      survives executor loss — required at cluster scale where an
      iterative operator may run for hours past the truncation point.
    - Otherwise ``localCheckpoint()``: executor-local blocks, no extra
      I/O — the right call for single-node test/bench runs where
      "executor loss" means the whole JVM died anyway.

    The returned DataFrame is value-identical in both modes; callers
    must not rely on which primitive ran.
    """
    spark = df.sparkSession
    ckpt_dir = _reliable_dir(spark)
    if ckpt_dir is not None:
        sc = spark.sparkContext
        try:
            current = sc.getCheckpointDir()
        except Exception:
            current = None
        if not current:
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


CONF_SCRATCH_DIR = "spark.xsarsea.scratch.dir"


def scratch_path(spark: SparkSession, name: str, key: str) -> str:
    """Scratch directory for persisted operator state (indexes, weight
    artifacts, streaming checkpoints built by the suite).

    Root comes from ``spark.xsarsea.scratch.dir`` (default ``/tmp``) so
    a deployment — or two sessions sharing one host — can isolate their
    state without code edits. The root must be a LOCAL filesystem path:
    suite-side maintenance walks it with ``os``/``shutil`` (listing,
    cleanup), which do not speak ``hdfs://``/``s3://`` URIs. On a
    cluster, point it at a shared mount (NFS/FUSE) or route the
    consumers through Hadoop FS APIs first.
    ``key`` (usually the dataset directory) is hashed into the leaf so
    runs against different datasets never collide even under the
    default shared root.
    """
    import hashlib

    root = get_conf(spark, CONF_SCRATCH_DIR, "/tmp").rstrip("/")
    digest = hashlib.md5(key.encode()).hexdigest()[:12]
    return f"{root}/xsarsea_{name}_{digest}"
