"""Distributed array/linalg — the reference's dask.array benchmark surface.

Covers `benchmark/matrix_multiplication.py` (block matmul of chunked
random matrices), `benchmark/svd_tall_skinny_matrix.py` (`da.linalg.svd`
— direct TSQR algorithm), `benchmark/svd_square_matrix.py`
(`svd_compressed` — randomized projection), `benchmark/kmeans.py`
(dask_ml KMeans) and `benchmark/parallelizing_svm.py` (ParallelPostFit
broadcast-model predict). SURVEY.md §1.1 maps chunked ndarrays to an RDD
of (block_row, block_col, numpy block) — per-partition imperative numpy
is the one place the RDD layer is genuinely the right tool (§2.10).

Algorithms are the same ones dask uses: blocked matmul is a join on the
contraction index + reduce, tall-skinny SVD is TSQR (per-partition QR,
tree-reduced R factors, small driver SVD), square SVD is the
Halko-Martinsson-Tropp randomized projection. All shapes scale: blocks
move through shuffles keyed by block coordinates, nothing materializes a
full matrix anywhere except the final k×k/driver-sized factors.
"""

from __future__ import annotations

import numpy as np
from pyspark import RDD
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Block = tuple[tuple[int, int], np.ndarray]


def random_block_matrix(
    spark: SparkSession, n_rows: int, n_cols: int, chunk: int, seed: int = 42
) -> RDD:
    """Chunked random matrix (reference `matrix_multiplication.py:25-26`
    `da.random.random(shape, chunks)`): RDD of ((bi, bj), block) with
    per-block deterministic seeds, generated on executors."""
    bi_n = (n_rows + chunk - 1) // chunk
    bj_n = (n_cols + chunk - 1) // chunk
    coords = [(bi, bj) for bi in range(bi_n) for bj in range(bj_n)]

    def make(coord: tuple[int, int]) -> Block:
        bi, bj = coord
        rows = min(chunk, n_rows - bi * chunk)
        cols = min(chunk, n_cols - bj * chunk)
        # PCG64 filling a preallocated buffer: the legacy RandomState
        # path allocates through a temp and faults every page twice —
        # measured 46.5 s vs 4.4 s for the same 1.6 GB on this box
        # (SCALE.md §array), and block generation is on every task's
        # critical path here
        block = np.empty((rows, cols))
        np.random.default_rng(seed + bi * 100003 + bj).random(out=block)
        return (bi, bj), block

    return spark.sparkContext.parallelize(coords, len(coords)).map(make)


def block_matmul(a: RDD, b: RDD, grid: tuple[int, int, int] | None = None) -> RDD:
    """C = A @ B over block RDDs (dask's blockwise contraction).

    With ``grid`` = (bi_n, bk_n, bj_n) the plan is the one-shuffle
    blockwise grid: each A block fans out to the bj_n output columns it
    feeds, each B block to its bi_n output rows, and every output block
    (i, j) is assembled by summing its bk_n local products inside ONE
    task. Parallelism is bi_n × bj_n and the partial products never
    re-shuffle. The alternative join-on-k plan (used when grid is
    unknown) hash-partitions on the contraction index — bk_n distinct
    keys — which caps parallelism at bk_n and shuffles every partial
    product a second time through the reduceByKey; at 16k×16k / 4k
    chunks that plan left 28 of 32 cores idle (measured 674s → the grid
    plan is the one dask/SUMMA use for exactly this reason).
    """
    if grid is None:
        a_k = a.map(lambda kv: (kv[0][1], (kv[0][0], kv[1])))  # k -> (i, A_ik)
        b_k = b.map(lambda kv: (kv[0][0], (kv[0][1], kv[1])))  # k -> (j, B_kj)
        return (
            a_k.join(b_k)
            .map(lambda kv: ((kv[1][0][0], kv[1][1][0]), kv[1][0][1] @ kv[1][1][1]))
            .reduceByKey(lambda x, y: x + y)
        )
    bi_n, bk_n, bj_n = grid

    # Transport granularity: PySpark moves many-MB single records ~7×
    # slower than the same bytes in few-MB records (measured 21.7s vs
    # 3.0s for the same 2 GB through partitionBy), so blocks ship as
    # ~4 MiB row slices and reassemble in the reduce task.
    slice_bytes = 4 << 20

    def _slices(block: np.ndarray):
        step = max(1, slice_bytes // max(1, block.shape[1] * block.itemsize))
        for s in range(0, block.shape[0], step):
            yield s, block[s : s + step]

    def fan_a(kv: Block):
        (bi, bk), block = kv
        slices = list(_slices(block))
        return [
            ((bi, bj), (bk, 0, s, len(slices), part))
            for bj in range(bj_n)
            for s, part in slices
        ]

    def fan_b(kv: Block):
        (bk, bj), block = kv
        slices = list(_slices(block))
        return [
            ((bi, bj), (bk, 1, s, len(slices), part))
            for bi in range(bi_n)
            for s, part in slices
        ]

    def contract_partition(records):
        # Manual streaming regroup: pyspark's groupByKey funnels the
        # partition through its python-side ExternalGroupBy spill
        # machinery (measured 233s vs 24s for the identical shuffle read
        # via partitionBy + mapPartitions). Blocks multiply the moment
        # both sides of a (key, bk) pair are fully reassembled, so peak
        # memory is ~2 blocks + in-flight slices, not the whole group.
        slices: dict[tuple, dict[int, np.ndarray]] = {}
        ready: dict[tuple, list] = {}
        acc: dict[tuple, np.ndarray] = {}
        for ij, (bk, side, s, n_sl, part) in records:
            d = slices.setdefault((ij, bk, side), {})
            d[s] = part
            if len(d) < n_sl:
                continue
            blk = np.vstack([d[k] for k in sorted(d)]) if n_sl > 1 else d[s]
            del slices[(ij, bk, side)]
            pair = ready.setdefault((ij, bk), [None, None])
            pair[side] = blk
            if pair[0] is not None and pair[1] is not None:
                p = pair[0] @ pair[1]
                acc[ij] = p if ij not in acc else acc[ij] + p
                del ready[(ij, bk)]
        yield from acc.items()

    return (
        a.flatMap(fan_a)
        .union(b.flatMap(fan_b))
        # exact partitioner: one output block per partition, no hash
        # collisions — every core gets a whole (i, j) contraction
        .partitionBy(bi_n * bj_n, partitionFunc=lambda ij: ij[0] * bj_n + ij[1])
        .mapPartitions(contract_partition)
    )


def random_row_panels(
    spark: SparkSession, n_rows: int, n_cols: int, panel_rows: int, seed: int = 42
) -> RDD:
    """Random matrix as an RDD of (panel_idx, contiguous row panel) —
    the layout the broadcast matmul consumes (one task per panel)."""
    n_panels = (n_rows + panel_rows - 1) // panel_rows
    def make(i: int):
        rows = min(panel_rows, n_rows - i * panel_rows)
        panel = np.empty((rows, n_cols))  # see random_block_matrix: PCG64
        np.random.default_rng(seed + i).random(out=panel)
        return i, panel
    return spark.sparkContext.parallelize(range(n_panels), n_panels).map(make)


def matmul_broadcast(spark: SparkSession, a_panels: RDD, b: np.ndarray) -> RDD:
    """C = A @ B when B fits in executor memory — the broadcast-hash-join
    of linear algebra: B ships once per worker via torrent broadcast,
    every row panel of A multiplies against it map-side, and the job has
    ZERO shuffle (vs the grid plan's 2·bk_n·n² replicated shuffle bytes).
    The right plan whenever one operand is executor-memory-sized (same
    decision rule Spark's own planner applies to broadcast joins); for
    two huge operands the grid plan in block_matmul is the scale path.

    Measured caveat (SCALE.md §array): a multi-GB ``b`` pays a SERIAL
    driver round-trip — pickle on the python driver, single-threaded
    ingest into the driver JVM's MemoryStore (heap-pressure-sensitive:
    minutes of full-GC churn observed at 2 GB under an 8 GB heap), then
    a per-worker unpickle. Above ~1 GB prefer
    :func:`matmul_broadcast_staged`, which builds the broadcast side
    executor-side from shared storage and never touches the driver."""
    bb = spark.sparkContext.broadcast(b)
    return a_panels.mapValues(lambda p: p @ bb.value)


def stage_matrix(
    panels: RDD, path: str, shape: tuple[int, int], panel_rows: int
) -> int:
    """Stage an RDD of (idx, 2-D row panel) as ONE ``.npy`` file on
    shared storage, each executor task writing its disjoint row slice —
    no driver round-trip. The driver creates the file as a SPARSE memmap
    (header only, no pages faulted), then every panel task opens it
    ``r+`` and assigns rows ``[idx*panel_rows, idx*panel_rows+len)``.

    Concurrency contract: disjoint byte ranges are race-free on a
    LOCAL (single-host) filesystem — the page cache serializes them —
    and that is the only path this sandbox exercises. On NETWORK
    mounts (NFS/fuse) writeback is page-granular with close-to-open
    consistency, and panel boundaries (128-byte npy header + arbitrary
    row offsets) are not page-aligned, so two clients flushing the
    same boundary page can clobber each other's rows: on such mounts
    either pad panels to page-aligned byte ranges or use the
    per-panel-object layout below. Object stores don't allow ranged
    writes at all — there, write per-panel objects and assemble
    per-executor instead; single-file is the fast path because readers
    can mmap it (see :func:`_open_staged`).

    Lifecycle: the staged file is matrix-sized and disk is the
    measured binding resource on this box (SCALE.md §array ceilings) —
    the CALLER owns deletion. The PREFERRED lifecycle is a UNIQUE path
    per staging (bench stages into a fresh ``mkdtemp`` and removes the
    whole directory after the multiply): unique paths make reader
    staleness impossible by construction. Re-staging new contents at a
    REUSED path is additionally defended by :func:`_open_staged`
    keying its memmap cache on (path, mtime_ns, size) — but that
    fallback assumes the filesystem reports nanosecond-resolution
    mtimes (true of ext4/xfs/tmpfs here); on a coarse-timestamp
    filesystem a same-size re-stage landing in the same tick would hit
    the stale mapping, so there use unique paths only. Returns the
    number of panels written."""
    n_rows, n_cols = shape
    mm = np.lib.format.open_memmap(
        path, mode="w+", dtype=np.float64, shape=(n_rows, n_cols)
    )
    del mm  # header written; body stays sparse until tasks fill it

    def save(kv) -> int:
        i, p = kv
        out = np.lib.format.open_memmap(path, mode="r+")
        out[i * panel_rows : i * panel_rows + p.shape[0]] = p
        out.flush()
        del out
        return 1

    return panels.map(save).sum()


# (get, set) entry points into the OpenBLAS that numpy already loaded,
# resolved once per worker process. PySpark pins every python worker to
# OMP_NUM_THREADS = spark.task.cpus (= 1) so that 32 concurrent tasks
# can't oversubscribe the box — the right default for the suite, but a
# low-concurrency big dgemm then runs 1 core per task and leaves the
# other 28 idle (measured: 251 s / 35 GFLOPS at 4-panel concurrency on
# 32 cores, vs ~350 GFLOPS aggregate for the identical dgemms outside
# Spark). openblas_set_num_threads overrides the env pin at runtime.
_BLAS_CTL: tuple | None = None


def _blas_thread_ctl() -> tuple:
    global _BLAS_CTL
    if _BLAS_CTL is None:
        import ctypes
        import glob
        import os

        get = set_ = None
        libs_dir = os.path.join(os.path.dirname(os.path.dirname(np.__file__)), "numpy.libs")
        for lib in glob.glob(os.path.join(libs_dir, "libopenblas*")):
            try:
                dll = ctypes.CDLL(lib)  # already mapped by numpy → same handle
            except OSError:
                continue  # unloadable candidate: fall through to (None, None)
            for sfx in ("64_", ""):  # ILP64 builds suffix every symbol
                g = getattr(dll, f"openblas_get_num_threads{sfx}", None)
                s = getattr(dll, f"openblas_set_num_threads{sfx}", None)
                if g is not None and s is not None:
                    get, set_ = g, s
                    break
            if get is not None:
                break
        _BLAS_CTL = (get, set_)  # (None, None) on MKL/other backends
    return _BLAS_CTL


# Per-process cache of read-only memmaps of staged matrices: opening is
# O(header) and, because every worker on a host maps the SAME file, the
# kernel page cache holds ONE physical copy of B per host no matter how
# many concurrent tasks multiply against it — the property sc.broadcast
# only gives the JVM side. (A private np.load copy per worker was
# measured at 332 s per task for 2.1 GB on this box — fresh-page faults
# dominate — vs 0.0 s to mmap; SCALE.md §array.) Keyed on
# (path, mtime_ns, size), not path alone: a reused python worker that
# sees the same path re-staged with NEW contents must re-mmap, not
# silently multiply against the stale mapping. The key discriminates
# same-size re-stages only because st_mtime_ns is nanosecond-granular
# on this box's filesystems — callers on coarse-timestamp mounts must
# use unique staging paths instead (stage_matrix docstring).
_STAGED_CACHE: dict[tuple[str, int, int], np.ndarray] = {}


def _open_staged(path: str) -> np.ndarray:
    import os

    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    b = _STAGED_CACHE.get(key)
    if b is None:
        b = np.load(path, mmap_mode="r")
        _STAGED_CACHE.clear()  # hold at most one staged matrix per worker
        _STAGED_CACHE[key] = b
    return b


def matmul_broadcast_staged(
    a_panels: RDD, b_path: str, blas_threads: int | None = None
) -> RDD:
    """C = A @ B with B staged as one ``.npy`` on shared storage — the
    broadcast join's executor-side build transposed to linalg, and the
    scale path for multi-GB broadcast operands.

    Why not ``sc.broadcast``: measured on this box (SCALE.md §array), a
    2 GB B through the driver costs 300-600 s wall, most of it serial
    (driver pickle + single-threaded MemoryStore ingest under GC
    pressure + a private unpickled copy per python worker), and the cost
    varies run-to-run with driver heap state. Staging the same bytes
    once via :func:`stage_matrix` and mmapping them read-only in every
    task costs ~35 s END-TO-END for the 16,384² product that the
    broadcast path ran in 298 s (250 vs 29 GFLOPS): no driver hop, no
    per-worker copy (one page-cached B per host), and the dgemm streams
    B straight out of the page cache.

    ``blas_threads``: per-task BLAS thread count for the dgemm. PySpark
    pins worker OMP_NUM_THREADS to spark.task.cpus (= 1) so the suite's
    32-way-concurrent tasks can't oversubscribe; this call runs FEWER,
    BIGGER tasks, so pass ~cores/concurrency to hand the idle cores to
    each dgemm (measured in-worker: set(8) → 2.9× on a 2,048² dgemm;
    8 panels × 4 threads saturates the 32-core box). Set and restored
    around the dgemm only — worker reuse must not leak the raised count
    into later 32-way stages.

    Reference basis: benchmark/matrix_multiplication.py:18-22 (the
    chunked matmul this accelerates when one operand is worker-sized).
    """

    def mult(p: np.ndarray) -> np.ndarray:
        b = _open_staged(b_path)
        if blas_threads is None:
            return p @ b
        get, set_ = _blas_thread_ctl()
        if get is None:
            return p @ b
        prev = get()
        set_(blas_threads)
        try:
            return p @ b
        finally:
            set_(prev)

    return a_panels.mapValues(mult)


def collect_matrix(blocks: RDD) -> np.ndarray:
    """Assemble a block RDD on the driver (tests/small results only)."""
    parts = dict(blocks.collect())
    bi_n = max(k[0] for k in parts) + 1
    bj_n = max(k[1] for k in parts) + 1
    return np.block([[parts[(i, j)] for j in range(bj_n)] for i in range(bi_n)])


def svd_tall_skinny(rows: RDD, n_cols: int, compute_u: bool = False):
    """TSQR SVD (reference `svd_tall_skinny_matrix.py:21-25`,
    `da.linalg.svd`): per-partition QR → R factors tree-reduced by
    stacked QR → small (k×k) SVD on the driver. `rows` is an RDD of 1-D
    row vectors. Returns (s, Vt) — and U via one more distributed pass
    when compute_u (U = A @ V @ diag(1/s), row-local)."""

    def local_r(it):
        block = np.array(list(it), dtype=np.float64)
        if block.size == 0:
            return []
        return [np.linalg.qr(block, mode="r")]

    def combine_r(r1: np.ndarray, r2: np.ndarray) -> np.ndarray:
        return np.linalg.qr(np.vstack([r1, r2]), mode="r")

    r = rows.mapPartitions(local_r).treeReduce(combine_r)
    _, s, vt = np.linalg.svd(r)
    if not compute_u:
        return s, vt
    v_s_inv = vt.T @ np.diag(1.0 / s)
    u = rows.map(lambda row: np.asarray(row, dtype=np.float64) @ v_s_inv)
    return u, s, vt


def svd_tall_skinny_panels(panels: RDD):
    """TSQR SVD over an RDD of (idx, 2-D row panel) — same algorithm as
    svd_tall_skinny (panel QR → tree-reduced stacked QR on the R factors
    → k×k SVD on the driver) but consuming contiguous panels directly.
    The row-at-a-time form pickles one Python object per matrix row;
    at 1M×2,048 that serialization dominates the QR flops (measured
    340s row-wise vs the panel path below). Panels are the layout the
    data is generated/stored in anyway — use this entry point whenever
    the source is chunked."""
    r = panels.map(lambda kv: np.linalg.qr(kv[1], mode="r")).treeReduce(
        lambda r1, r2: np.linalg.qr(np.vstack([r1, r2]), mode="r")
    )
    _, s, vt = np.linalg.svd(r)
    return s, vt


def svd_compressed(
    blocks: RDD, shape: tuple[int, int], chunk: int, k: int, seed: int = 42, n_oversample: int = 10
):
    """Randomized SVD for square matrices (reference
    `svd_square_matrix.py:18-24`, dask `svd_compressed`; Halko et al.):
    project A through a random Gaussian Ω, orthonormalize Y = AΩ, form
    B = QᵀA (small), SVD B on the driver."""
    n_rows, n_cols = shape
    p = k + n_oversample
    rng = np.random.RandomState(seed)
    omega = rng.standard_normal((n_cols, p))

    # Y = A @ Omega: block-row local products, reduced per block-row
    def times_omega(kv: Block):
        (bi, bj), block = kv
        return bi, block @ omega[bj * chunk : bj * chunk + block.shape[1]]

    y_rows = blocks.map(times_omega).reduceByKey(lambda x, y: x + y)  # bi -> Y_bi
    # TSQR on Y's block rows for orthonormal Q implicit via R
    r = y_rows.map(lambda kv: np.linalg.qr(kv[1], mode="r")).treeReduce(
        lambda r1, r2: np.linalg.qr(np.vstack([r1, r2]), mode="r")
    )
    r_inv = np.linalg.pinv(r)
    # B = QᵀA with Q = Y R⁻¹: join A's blocks with their Q block-row on
    # the block-row key, form the partial Q_biᵀ·A_(bi,bj) products on
    # executors, reduce per block-col. No Y/Q factor ever materializes on
    # the driver — only B itself (p × n_cols, driver-sized by design)
    # comes back.
    q_rows = y_rows.mapValues(lambda y: y @ r_inv)  # bi -> Q block-row
    a_by_row = blocks.map(lambda kv: (kv[0][0], (kv[0][1], kv[1])))
    b_cols = (
        a_by_row.join(q_rows)
        .map(lambda kv: (kv[1][0][0], kv[1][1].T @ kv[1][0][1]))
        .reduceByKey(lambda x, y: x + y)
        .collect()
    )
    b = np.hstack([blk for _, blk in sorted(b_cols)])
    _, s, vt = np.linalg.svd(b, full_matrices=False)
    return s[:k], vt[:k]


class COO:
    """Minimal coordinate-format sparse block (the `sparse.COO` shape the
    reference converts chunks into, `distributed/tests/test_collections.py:
    191-200`) — dependency-free since neither `sparse` nor scipy ships in
    this container. Stores (coords, data, shape); dense↔sparse round-trip
    plus the reductions/elementwise ops the benchmark exercises."""

    def __init__(self, coords: np.ndarray, data: np.ndarray, shape: tuple[int, int]):
        self.coords = coords  # (2, nnz) int array
        self.data = data  # (nnz,) values
        self.shape = shape

    @classmethod
    def from_dense(cls, block: np.ndarray, keep_threshold: float = 0.0) -> COO:
        mask = np.abs(block) > keep_threshold
        coords = np.vstack(np.nonzero(mask))
        return cls(coords, block[mask], block.shape)

    def todense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=self.data.dtype)
        out[self.coords[0], self.coords[1]] = self.data
        return out

    @property
    def nnz(self) -> int:
        return int(self.data.size)

    def sum(self) -> float:
        return float(self.data.sum())

    def multiply(self, scalar: float) -> COO:
        return COO(self.coords, self.data * scalar, self.shape)


def map_blocks(blocks: RDD, fn) -> RDD:
    """dask's `map_blocks` over a ((bi, bj), block) RDD: apply ``fn`` to
    every block, keep coordinates. The reference's sparse workflow is
    `map_blocks(sparse.COO)` then reductions — here
    `map_blocks(rdd, COO.from_dense)` sparsifies each chunk on its
    executor (the dense block never moves), after which per-block
    reductions shuffle only scalars."""
    return blocks.mapValues(fn)


def kmeans_fit(df: DataFrame, k: int = 3, seed: int = 42, vec_col: str = "embedding"):
    """KMeans over an array column (reference `benchmark/kmeans.py:22-28`,
    dask_ml KMeans ≈ pyspark.ml scalable k-means||, same oversampling
    initialization family)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn("features", array_to_vector(F.col(vec_col).cast("array<double>")))
    return KMeans(k=k, seed=seed, featuresCol="features").fit(feats)


class LeastSquaresModel:
    """Minimal picklable linear classifier for `parallel_post_fit_predict`
    demos/benchmarks when sklearn is absent (reference uses
    `sklearn.svm.SVC` inside dask_ml ParallelPostFit,
    `parallelizing_svm.py:23-41`): least-squares fit on the driver,
    thresholded predict executor-side. Any object with
    ``.predict(ndarray)`` plugs into the same broadcast path."""

    def __init__(self, w: np.ndarray, b: float):
        self.w, self.b = w, b

    @classmethod
    def fit(cls, x: np.ndarray, y: np.ndarray) -> "LeastSquaresModel":
        xb = np.hstack([x, np.ones((len(x), 1))])
        coef, *_ = np.linalg.lstsq(xb, y * 2.0 - 1.0, rcond=None)
        return cls(coef[:-1], float(coef[-1]))

    def predict(self, x: np.ndarray) -> np.ndarray:
        return (x @ self.w + self.b > 0).astype(float)


def parallel_post_fit_predict(
    spark: SparkSession, model, df: DataFrame, feature_col: str = "embedding"
) -> DataFrame:
    """Broadcast-model batch predict (reference `parallelizing_svm.py:
    32-42`, dask_ml ParallelPostFit): fit stays single-node, predict
    distributes — the model rides a broadcast, each Arrow batch predicts
    vectorized. Works for any object with .predict(ndarray)."""
    bc = spark.sparkContext.broadcast(model)

    def predict(batches):
        import pandas as pd

        m = bc.value
        for pdf in batches:
            # single fromiter-style stack: pandas holds the Arrow list
            # column as object ndarrays — np.vstack over .values avoids
            # the per-row asarray loop
            x = np.vstack(pdf[feature_col].values).astype(np.float64, copy=False)
            out = pdf.drop(columns=[feature_col]).copy()
            out["prediction"] = pd.Series(np.asarray(m.predict(x)).ravel(), index=pdf.index)
            yield out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name != feature_col
    )
    return df.mapInPandas(predict, f"{out_schema}, prediction double")
