"""The clonealign probabilistic model as pure JAX functions.

This reproduces the generative model + variational family of the reference
(reference R/inference-tflow.R:238-342) but is *designed for TPU*, not
translated. The reference builds a TF1 graph that materializes a
(S, C, N, G) tensor of per-sample/clone/cell/gene multinomial probabilities
(reference R/inference-tflow.R:288-296). Here the multinomial log-likelihood
is decomposed algebraically so that tensor never exists:

With m[s,g] = mu samples, L[g,c] = clone copy number, and
rfe[n,g] = exp(psi_n . W_g + x_n . beta_g) the cell-specific multiplier,
the (normalized-over-genes) multinomial log-probability of cell n under
clone c is

    log p(y_n | c) = log_binom[n]
                   + sum_g y_ng log m[s,g]            (A2 = Y @ log m)
                   + sum_g y_ng log rfe[n,g]          (A1, see below)
                   + sum_g y_ng log L[g,c]            (B  = Y @ log L, constant)
                   - t_n * log Z[s,c,n]

    Z[s,c,n] = sum_g m[s,g] L[g,c] rfe[n,g]

where t_n = sum_g y_ng. Because log rfe = psi W^T + X beta^T,

    A1[n] = sum_k psi[n,k] (Y W)[n,k] + sum_p x[n,p] (Y beta)[n,p]

— two thin (N,G)x(G,K) matmuls. Z is one (S*C,G)x(G,N) matmul. Everything
lands on the MXU with O(N*G*(C+K)) FLOPs and O(N*G) memory, versus the
reference's O(S*C*N*G) memory.

ELBO term-by-term parity with the reference graph (including its quirks,
SURVEY.md §2.4 items 6-7) is asserted against a float64 NumPy oracle in
tests/test_elbo_parity.py.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

LOG_2PI = math.log(2.0 * math.pi)

# --- TPU matmul-precision policy -------------------------------------------
# On TPU, f32 matmuls default to single-pass bf16-input MXU passes (~8-bit
# mantissas). Measured on v5e (benchmarks/results_tpu_r3.jsonl): that
# inflates converged-fit ELBO error vs the f64 oracle ~10x over generic-f32
# and flips extra assignments, while pinning precision globally costs 3.2x
# throughput at the 100k x 5k benchmark (it also breaks the int8-Y matmul
# path). The policy is therefore per-contraction, from measurement:
#   A — the thin Y-carrying terms (A1 = Y @ W, A2 = Y @ log mu / the
#       colsum.log_mu dot): HIGHEST is FREE (295k vs 288k cells/s; the
#       parity error lives here, counts/colsums are large) -> HIGHEST.
#   Z — the (S*C)-column gene-normalizer contraction: HIGHEST costs 3x
#       (the multi-pass algorithm defeats fusing exp(psi.W) into the
#       matmul), and its default-precision ELBO error is only ~5e-5
#       relative. With A pinned, converged TPU f32 fits land 8e-6..5e-5
#       relative of the f64 oracle with labels exactly matching the CPU
#       f32 oracle (tests/test_tpu_hardware.py) -> DEFAULT.
# Env overrides exist for experiments, not for production use. No effect
# off-TPU: CPU/GPU f32 matmuls are full precision already.
_A_PRECISION = os.environ.get("CLONEALIGN_A_PRECISION", "highest")
_Z_PRECISION = os.environ.get("CLONEALIGN_Z_PRECISION", "default")


def _a_precision():
    return jax.default_matmul_precision(_A_PRECISION)


def _z_precision():
    return jax.default_matmul_precision(_Z_PRECISION)


# ---------------------------------------------------------------------------
# Numerics helpers (reference R/inference-tflow.R:2-15)
# ---------------------------------------------------------------------------

def softplus(x):
    return jax.nn.softplus(x)


def safe_inverse_softplus(x):
    """log(exp(x)-1) computed stably for positive x
    (reference R/inference-tflow.R:6-11)."""
    x = jnp.asarray(x)
    return jnp.log(-jnp.expm1(-jnp.abs(x))) + jnp.maximum(x, 0.0)


def _normal_log_prob(x, loc=0.0, scale=1.0):
    z = (x - loc) / scale
    return -0.5 * z * z - jnp.log(scale) - 0.5 * LOG_2PI


# ---------------------------------------------------------------------------
# Pytrees
# ---------------------------------------------------------------------------

class CloneAlignParams(NamedTuple):
    """Free variables optimized jointly by Adam
    (reference R/inference-tflow.R:240-273)."""

    W: jax.Array             # (G, K) gene loadings, init 0
    chi_unconstr: jax.Array  # (K,)  prior precision of W (chi = exp), init 0
    psi: jax.Array           # (N, K) cell latent factors, init PCA
    beta: jax.Array          # (G, P) covariate coefficients, init 0 (P may be 0)
    alpha_unconstr: jax.Array  # (C,) clone mixing logits, init 0
    qmu_loc: jax.Array       # (G,) variational loc of inv-softplus(mu)
    qmu_log_scale: jax.Array  # (G,) log scale, init log(1)=0
    gamma_logits: jax.Array  # (N, C) variational clone responsibilities


class ModelData(NamedTuple):
    """Static per-fit tensors (precomputed once, device-resident)."""

    Y: jax.Array         # (N, G) counts as float
    L: jax.Array         # (G, C) copy numbers (saturated)
    X: Optional[jax.Array]  # (N, P) covariates or None
    s: jax.Array         # (N,) per-cell totals (multinomial total_count)
    log_binom: jax.Array  # (N,) lgamma(s+1) - sum_g lgamma(y+1)
    YlogL: jax.Array     # (N, C) = sum_g xlogy(y_ng, L_gc), precomputed
    # (G,) per-gene count totals. Lets the ELBO treat the A2 = Y @ log_mu
    # term as dot(colsum_Y, sum_s log_mu)/S — see elbo() — removing one full
    # pass over Y from every training step (forward AND backward). None only
    # for hand-built pytrees; elbo() falls back to computing it on the fly.
    colsum_Y: Optional[jax.Array] = None


class ModelConfig(NamedTuple):
    K: int = 1
    P: int = 0
    mc_samples: int = 1
    fix_alpha: bool = False
    # Likelihood backend: "xla" -> the exact XLA decomposed path; "z_cheb"
    # -> the XLA path with the log-normalizer evaluated through a
    # per-(sample, clone) Chebyshev expansion in psi (K=1, P=0 only — see
    # _compute_logZ_cheb). At THIS layer "auto" is a synonym for "xla"; the
    # public API (api.setup_fit) resolves "auto" to z_cheb in the
    # benchmarked K=1/P=0/S=1/float32 corner before the config reaches the
    # model (only past a ~1M-element size gate — see api.py), so out-of-box
    # fits run the fast normalizer while hand-built ModelConfigs keep exact
    # semantics. ("fused" — the Pallas kernel — was
    # retired in round 4 after losing to XLA in every measured regime; the
    # kernel remains as a benchmark scaffold in ops/fused_likelihood.py,
    # docs/design.md §2b.)
    likelihood_impl: str = "auto"
    # Chebyshev degree for likelihood_impl="z_cheb". Measured on-chip
    # (round 3): D=16 is 22% faster per step than D=32 at 100k x 5k x 10
    # (1.66 vs 2.12 ms) and full fits at D=16/24/32 agree to ~4e-7 relative
    # final ELBO with identical assignments; even under a harsher-than-any-
    # fit stress (psi +-4, W ~ N(0,1)) D=16's value error is 5.7e-5 while
    # realistic post-fit spreads are machine-exact. D=32 remains available
    # for paranoia (value error ~1e-13 over an 8-sigma psi range).
    z_degree: int = 16


def _check_impl(config: "ModelConfig") -> None:
    # "fused" (the Pallas kernel) was retired as a model backend in round 4.
    # Measured at 100k x 5k x 10 on v5e (round 2, honest fetch-synced
    # timing): 15.8 ms per forward vs 4.0 ms for the identical computation
    # in XLA, because Mosaic pays for transposed in-kernel dots (y^T @ psi
    # and rfe^T @ dZ run at 4.8-16 ms) that XLA gets free via layout
    # assignment; the round-3 pallas_vs_xla_regimes probe found no regime
    # where it wins. With the constant-cotangent ELBO decomposition (see
    # elbo()) the XLA training step is at its structural floor (two Y
    # passes). Full analysis: docs/design.md section 2b. The kernel survives
    # as a directly-importable, tested scaffold (ops/fused_likelihood.py).
    if config.likelihood_impl == "fused":
        raise ValueError(
            "likelihood_impl='fused' was retired (docs/design.md §2b); use "
            "'auto', 'xla', or 'z_cheb'. The Pallas kernel is still "
            "importable from clonealign_tpu.ops.fused_likelihood."
        )


@jax.jit
def _prepare_data_core(Y, L):
    # one-time per fit: always full precision (the YlogL constant feeds every
    # ELBO evaluation; its cost amortizes to nothing)
    with jax.default_matmul_precision("highest"):
        s = jnp.sum(Y, axis=1)
        log_binom = jax.lax.lgamma(s + 1.0) - jnp.sum(jax.lax.lgamma(Y + 1.0), axis=1)
        log_L_safe = jnp.where(L > 0, jnp.log(jnp.where(L > 0, L, 1.0)), 0.0)
        B = Y @ log_L_safe
        hits_zero = (Y @ (L <= 0).astype(Y.dtype)) > 0
        B = jnp.where(hits_zero, -jnp.inf, B)
        return s, log_binom, B, jnp.sum(Y, axis=0)


@jax.jit
def _prepare_data_core_table(Yi, L, table):
    """Integer-count twin of :func:`_prepare_data_core`: ``Yi`` arrives in
    its (<=16-bit) integer wire dtype and the elementwise lgamma becomes a
    gather from the log-factorial table — bit-identical values, a fraction
    of the XLA:TPU compile cost (see _log_factorial_table). Also returns
    the exact max count (integer-storage range check) and min count
    (negative-count guard: ``jnp.take`` CLIPS out-of-range indices, so a
    negative count would otherwise gather log(0!) and corrupt silently
    where the lgamma path produced a visible inf)."""
    dtype = L.dtype
    Y = Yi.astype(dtype)
    with jax.default_matmul_precision("highest"):
        s = jnp.sum(Y, axis=1)
        lgam = jnp.take(table, Yi.astype(jnp.int32), axis=0)
        log_binom = jax.lax.lgamma(s + 1.0) - jnp.sum(lgam, axis=1)
        log_L_safe = jnp.where(L > 0, jnp.log(jnp.where(L > 0, L, 1.0)), 0.0)
        B = Y @ log_L_safe
        hits_zero = (Y @ (L <= 0).astype(dtype)) > 0
        B = jnp.where(hits_zero, -jnp.inf, B)
        mx = jnp.max(Y) if Y.size else jnp.zeros((), dtype)
        mn = jnp.min(Y) if Y.size else jnp.zeros((), dtype)
        return s, log_binom, B, jnp.sum(Y, axis=0), mx, mn


def prepare_data(Y, L, x=None, dtype=jnp.float32, y_storage=None) -> ModelData:
    """Build the device-resident data pytree.

    ``YlogL`` uses xlogy semantics: a gene with zero copy number in clone c
    contributes -inf to that clone's log-likelihood only for cells expressing
    it. (The reference feeds probs straight into tfd.Multinomial, which yields
    NaN for that corner; xlogy is the correct limit and agrees everywhere L>0.)

    ``y_storage`` optionally stores the (large) Y matrix in a narrower dtype,
    cutting the dominant HBM traffic of every likelihood evaluation
    (contractions still accumulate in the compute dtype). All derived
    statistics (totals, lgamma terms, Y @ log L, colsum_Y) are computed at
    full precision *before* the downcast. Integer storage
    (``jnp.int8``/``jnp.int16``) is EXACT — counts are integers — and values
    exceeding the integer range raise instead of silently wrapping; int8 is
    the fastest option measured (docs/design.md section 2) with clone
    assignments identical to f32 at benchmark scale. ``jnp.bfloat16`` is the
    lossy alternative when counts exceed int16 (exact only below 257;
    larger counts round to nearest-even, ELBO perturbed ~1e-5 relative).
    """
    try:
        import scipy.sparse as sp

        if sp.issparse(Y):
            return prepare_data_sparse(Y, L, x=x, dtype=dtype, y_storage=y_storage)
    except ImportError:  # pragma: no cover
        pass
    if int(Y.shape[0]) * int(Y.shape[1]) > _CHUNK_ELEMENTS:
        return _prepare_data_dense_chunked(Y, L, x=x, dtype=dtype, y_storage=y_storage)
    store_dt = jnp.dtype(dtype if y_storage is None else y_storage)
    if isinstance(Y, np.ndarray):
        wire = _wire_np(Y.dtype, dtype, store_dt)
        if wire is not None and Y.dtype != wire:
            if jnp.issubdtype(store_dt, jnp.integer):
                _host_check_lossless(Y, wire, store_dt)
            Y = np.ascontiguousarray(Y, dtype=wire)
    Yw = Y if isinstance(Y, jax.Array) else jnp.asarray(Y)
    L = jnp.asarray(L, dtype)
    X = None if x is None else jnp.asarray(x, dtype)
    table = _stats_table_for(Yw.dtype, dtype)
    if table is not None:
        s, log_binom, B, colsum, mx, mn = _prepare_data_core_table(Yw, L, table)
        if float(mn) < 0:
            raise ValueError(
                "gene_expression_data must be non-negative raw counts"
            )
        if y_storage is not None and jnp.issubdtype(store_dt, jnp.integer):
            info = jnp.iinfo(store_dt)
            if float(mx) > info.max:
                raise ValueError(
                    f"y_storage={store_dt.name} cannot hold the largest "
                    f"count ({float(mx):.0f} > {info.max}); use "
                    "int16/bfloat16/float32"
                )
        Y = Yw if Yw.dtype == store_dt else Yw.astype(store_dt)
    else:
        Yf = Yw if Yw.dtype == jnp.dtype(dtype) else Yw.astype(dtype)
        s, log_binom, B, colsum = _prepare_data_core(Yf, L)
        if y_storage is not None:
            _check_integer_storage(Yf, y_storage)
            Yf = Yf.astype(y_storage)
        Y = Yf
    _check_cells_feasible(B)
    return ModelData(
        Y=Y, L=L, X=X, s=s, log_binom=log_binom, YlogL=B, colsum_Y=colsum
    )


# Above this many elements the dense prepare/init paths switch to row-chunked
# processing so peak device memory is O(chunk x G) + the storage-dtype copy of
# Y, never a second full-precision N x G tensor. 2^28 elements = 1 GB at f32;
# the 100k x 5k benchmark config (5e8) chunks, 1M x 2k (2e9) must.
_CHUNK_ELEMENTS = 1 << 28


def _row_chunk_size(N: int, G: int) -> int:
    rows = max(1, _CHUNK_ELEMENTS // max(G, 1))
    rows = min(rows, N)
    if rows >= 8:
        rows -= rows % 8
    return rows


def _stats_body(yc, lgam, log_L_safe, zero_cols, fresh=None):
    """Shared math of the one-time data-statistics programs. ``lgam`` is the
    elementwise log(y!) matrix — a table gather on the integer paths, or
    ``lax.lgamma(yc + 1)`` on the float path. ``fresh`` (when given) masks
    first-visit rows out of the cross-row column sum for a clamped tail
    block that overlaps rows already processed."""
    with jax.default_matmul_precision("highest"):
        s = jnp.sum(yc, axis=1)
        lb = jax.lax.lgamma(s + 1.0) - jnp.sum(lgam, axis=1)
        B = yc @ log_L_safe
        B = jnp.where((yc @ zero_cols) > 0, -jnp.inf, B)
        cs = jnp.sum(yc if fresh is None else jnp.where(fresh, yc, 0), axis=0)
    return s, lb, B, cs


@jax.jit
def _chunk_stats(yc, log_L_safe, zero_cols):
    # one-time per fit: full precision, see _prepare_data_core. Float-count
    # path: keeps the (rows, G) lgamma (slow to COMPILE on XLA:TPU — see
    # _log_factorial_table — but required when counts may be fractional).
    if not yc.size:
        z = jnp.zeros((), yc.dtype)
        s, lb, B, cs = _stats_body(yc, yc, log_L_safe, zero_cols)
        return s, lb, B, cs, z, z
    s, lb, B, cs = _stats_body(
        yc, jax.lax.lgamma(yc + 1.0), log_L_safe, zero_cols
    )
    ymax = jnp.max(yc)
    nonint = jnp.max(jnp.abs(yc - jnp.round(yc)))
    return s, lb, B, cs, ymax, nonint


@jax.jit
def _chunk_stats_table(yci, table, log_L_safe, zero_cols):
    """Integer-count twin of :func:`_chunk_stats`: the elementwise lgamma
    over the (rows, G) block becomes a gather from ``table`` — bit-identical
    values (the table IS lax.lgamma evaluated on 0..nmax, see
    _log_factorial_table) at a fraction of the XLA:TPU compile cost.
    ``nonint`` is identically zero for integer inputs. Returns the min count
    too: ``jnp.take`` CLIPS out-of-range indices, so callers must raise on
    negatives rather than let them gather log(0!) silently."""
    dtype = log_L_safe.dtype
    yc = yci.astype(dtype)
    lgam = jnp.take(table, yci.astype(jnp.int32), axis=0)
    s, lb, B, cs = _stats_body(yc, lgam, log_L_safe, zero_cols)
    ymax = jnp.max(yc) if yc.size else jnp.zeros((), dtype)
    ymin = jnp.min(yc) if yc.size else jnp.zeros((), dtype)
    return s, lb, B, cs, ymax, jnp.zeros((), dtype), ymin


_LGAMMA_TABLES: dict = {}


def _log_factorial_table(nmax: int, dtype) -> jax.Array:
    """log(k!) for k = 0..nmax, evaluated as ``lax.lgamma`` on a 1-D ramp in
    ``dtype`` — so a gather from it is BIT-IDENTICAL to the elementwise
    ``lax.lgamma(yc + 1)`` it replaces (same op, same input values: k + 1 is
    exact in float32 up to 2^24 and nmax is capped at 65535 by
    _table_wire_dtype), while sidestepping a measured XLA:TPU compiler
    pathology: lgamma on a (53k, 5k) operand takes 32-42 s to COMPILE on
    v5e (vs 2.5 s for the identical program without it; every committed
    golden/oracle value stays valid because the gathered values are the
    same bits). Probe rows: setup_phases in benchmarks/results_tpu_r4.jsonl."""
    key = (int(nmax), jnp.dtype(dtype).name)
    t = _LGAMMA_TABLES.get(key)
    if t is None:
        ks = jnp.arange(1, int(nmax) + 2, dtype=dtype)  # k + 1 for k = 0..nmax
        t = _LGAMMA_TABLES[key] = jax.lax.lgamma(ks)
    return t


def _wire_np(y_np, dtype, store_dt):
    """Shipping dtype for a HOST count array: the FEWEST bytes per element
    that reproduce the exact values the data statistics would otherwise
    see, or None (ship in the host dtype as-is).

    Integer storage is lossless by contract (host values are validated
    against the storage bounds BEFORE any downcast, same errors as the
    device check), so chunks ship as the narrower of the host integer
    dtype and the storage dtype. Float-ish storage ships at the compute
    dtype when the host dtype is wider (stats are computed at compute
    precision either way, so a host-side f64->f32 cast changes nothing);
    bfloat16 storage downcasts ON DEVICE from compute precision (stats
    must see pre-rounding values), so its wire is f32, not bf16. Measured
    at 100k x 5k (int16 host, int8 storage): 2x fewer wire bytes
    (benchmarks setup_phases probe)."""
    y_np = np.dtype(y_np)
    if jnp.issubdtype(store_dt, jnp.integer):
        if np.issubdtype(y_np, np.integer) and y_np.itemsize <= store_dt.itemsize:
            return None  # already at or below the wire width
        return np.dtype(store_dt.name)
    if y_np.itemsize > jnp.dtype(dtype).itemsize and store_dt != jnp.bfloat16:
        return np.dtype(jnp.dtype(dtype).name)
    if y_np.itemsize > 4 and store_dt == jnp.bfloat16:
        return np.dtype(jnp.dtype(dtype).name)
    return None


def _host_check_lossless(c, wire_np, store_dt):
    """Same contract and messages as the post-stats device check; runs
    BEFORE a host downcast so wrapped values can never be uploaded."""
    info = np.iinfo(wire_np if np.issubdtype(wire_np, np.integer)
                    else np.dtype(store_dt.name))
    cmax = float(c.max()) if c.size else 0.0
    if cmax > info.max:
        raise ValueError(
            f"y_storage={store_dt.name} cannot hold the largest "
            f"count ({cmax:.0f} > {info.max}); use int16/bfloat16/float32"
        )
    # Both wrap directions must be closed BEFORE the downcast: a host count
    # below the wire's lower bound (e.g. int16 -129 into an int8 wire) wraps
    # POSITIVE, so the post-upload device min guard would see +127 and pass
    # (round-5 advisor finding). Valid counts are non-negative, so rejecting
    # negatives (same message as the device check) bounds below; the max
    # check above bounds above.
    if c.size and float(c.min()) < 0:
        raise ValueError(
            "gene_expression_data must be non-negative raw counts"
        )
    if np.issubdtype(c.dtype, np.floating) and c.size and np.any(c != np.trunc(c)):
        raise ValueError(
            "integer y_storage requires integer counts; found fractional values"
        )


def _stats_table_for(shipped_dtype, dtype):
    """The log-factorial gather table when the as-shipped count dtype is an
    integer of at most 16 bits (so log(k!) fits a <=65536-entry table and
    intness is guaranteed by the dtype itself), else None (float path)."""
    d = np.dtype(jnp.dtype(shipped_dtype).name)
    if np.issubdtype(d, np.integer) and d.itemsize <= 2:
        return _log_factorial_table(np.iinfo(d).max, dtype)
    return None


def _block_slice(Yw, i, block):
    """Clamped row block ``i`` of the device-resident matrix plus its
    first-visit mask. One fixed block shape -> ONE compiled program reused
    for every block including the tail (distinct tail shapes used to
    compile separate executables through the remote compiler; a fori_loop
    mega-program was also tried and rejected — same 42 s lgamma-dominated
    compile as the per-shape path, benchmarks setup_phases probe). The
    tail block is clamped to end at N, so it may overlap rows already
    processed: row-aligned outputs (s, log_binom, YlogL) recompute
    identical values (the caller drops them) and cross-row reductions
    (colsum/max/nonint) mask the overlap out via ``fresh``."""
    N = Yw.shape[0]
    start = jnp.minimum(i * block, N - block)
    yc = jax.lax.dynamic_slice_in_dim(Yw, start, block, 0)
    fresh = ((start + jnp.arange(block)) >= i * block)[:, None]
    return yc, fresh


@functools.partial(jax.jit, static_argnames=("block",))
def _block_stats(Yw, log_L_safe, zero_cols, i, block: int):
    """Float-wire data statistics for row block ``i`` (see _block_slice).
    All arithmetic matches _chunk_stats: compute dtype from ``log_L_safe``,
    matmuls at HIGHEST (exact for integer counts, so block order cannot
    change any result)."""
    dtype = log_L_safe.dtype
    yc, fresh = _block_slice(Yw, i, block)
    yc = yc.astype(dtype)
    s, lb, B, cs = _stats_body(
        yc, jax.lax.lgamma(yc + 1.0), log_L_safe, zero_cols, fresh
    )
    mx = jnp.max(jnp.where(fresh, yc, -jnp.inf))
    ni = jnp.max(jnp.where(fresh, jnp.abs(yc - jnp.round(yc)), 0))
    return s, lb, B, cs, mx, ni


@functools.partial(jax.jit, static_argnames=("block",))
def _block_stats_table(Yw, table, log_L_safe, zero_cols, i, block: int):
    """Integer-wire twin of :func:`_block_stats`: elementwise lgamma is a
    gather from the log-factorial table (bit-identical values, ~20x less
    XLA:TPU compile — see _log_factorial_table); nonint is identically
    zero for integer inputs. Also returns the block min (negative-count
    guard — the table gather clips, see _chunk_stats_table)."""
    dtype = log_L_safe.dtype
    yci, fresh = _block_slice(Yw, i, block)
    yc = yci.astype(dtype)
    lgam = jnp.take(table, yci.astype(jnp.int32), axis=0)
    s, lb, B, cs = _stats_body(yc, lgam, log_L_safe, zero_cols, fresh)
    mx = jnp.max(jnp.where(fresh, yc, -jnp.inf))
    mn = jnp.min(jnp.where(fresh, yc, jnp.inf))
    return s, lb, B, cs, mx, jnp.zeros((), dtype), mn


def _prefetched(idxs, make):
    """Yield ``make(i)`` for each index with ONE-AHEAD prefetch: chunk i+1 is
    prepared on a worker thread while the caller uploads/processes chunk i.
    The host work per chunk — bounds-check scan + the wire-dtype copy
    (``_host_chunk``) — is numpy, which releases the GIL, so it genuinely
    overlaps the in-flight ``device_put`` (the uploads were measured strictly
    serial with the host prep before this: prepare_data 23.4 s against a
    13.1 s bare-put floor at 100k x 5k, benchmarks setup_phases probe r4).
    Exceptions from ``make`` (range/integrality validation) surface on the
    consuming side before that chunk is uploaded, exactly as in the serial
    loop."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(make, idxs[0])
        for j in range(len(idxs)):
            c = fut.result()
            if j + 1 < len(idxs):
                fut = ex.submit(make, idxs[j + 1])
            yield c


@functools.lru_cache(maxsize=None)
def _row_writer(donate: bool):
    """Donated dynamic-update-slice: fill a preallocated (N, G) device
    buffer one row chunk at a time. With donation (TPU) the write is in
    place, so assembling Y from chunks peaks at N x G x storage_bytes +
    one chunk — a ``jnp.concatenate`` of all chunks would transiently hold
    TWO full copies (16 GB at 1M x 2k float32 on a 16 GB chip — round-5
    review finding). CPU ignores donation (copies); correctness is
    unchanged, so the donate flag just silences the unusable-donation
    warning there. The chunk offset is passed as a traced scalar so all
    equal-shaped chunks share one compiled program (body + tail = two)."""

    def write(buf, rows, off):
        zero = jnp.zeros((), off.dtype)  # match off's dtype under x64
        return jax.lax.dynamic_update_slice(buf, rows, (off, zero))

    return jax.jit(write, donate_argnums=(0,) if donate else ())


@functools.lru_cache(maxsize=None)
def _assembly_strategy() -> str:
    """How to assemble device Y from row chunks.

    'donate' (real TPU): in-place donated writes — peak device memory is
    the buffer + one in-flight chunk. 'concat' (the axon development
    tunnel): chaining donated executions through the tunnel deadlocks the
    read of the final buffer (measured round 5 — a 3-write chain plus
    ``jnp.sum`` fetch hangs; the same chain on a real TPU runtime aliases
    correctly), so fall back to one concatenate (the pre-round-5 peak, on
    a harness where HBM is never the constraint). 'fill' (CPU and
    everything else): the writer path without donation — content-identical,
    exercised by the CPU test suite."""
    d = jax.devices()[0]
    version = str(getattr(d.client, "platform_version", ""))
    if d.platform == "tpu":
        return "concat" if "axon" in version.lower() else "donate"
    return "fill"


def _fill_rows(parts, N, G, store_dt):
    """Assemble (N, G) storage-dtype Y from an iterator of (offset, chunk)
    pairs via the backend's :func:`_assembly_strategy`."""
    strat = _assembly_strategy()
    if strat == "concat":
        chunks = [c for _, c in parts]
        return jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]
    write = _row_writer(strat == "donate")
    buf = jnp.zeros((N, G), dtype=store_dt)
    for off, c in parts:
        buf = write(buf, c, jnp.asarray(off, jnp.int32))
    return buf


def _prepare_data_dense_chunked(Y, L, x=None, dtype=jnp.float32, y_storage=None):
    """Row-chunked version of the dense prepare path (same outputs; see
    prepare_data). Statistics stream through the device one chunk at a time,
    and the device-resident Y is built directly in the storage dtype — peak
    device memory is O(chunk x G) + N x G x storage_bytes instead of two
    full-precision copies. If ``Y`` is already a device array in the storage
    dtype it is used as-is (zero-copy). Host chunk preparation is
    double-buffered against the device transfers (:func:`_prefetched`)."""
    N, G = Y.shape
    L = jnp.asarray(L, dtype)
    log_L_safe = jnp.where(L > 0, jnp.log(jnp.where(L > 0, L, 1.0)), 0.0)
    zero_cols = (L <= 0).astype(dtype)
    store = dtype if y_storage is None else y_storage
    store_dt = jnp.dtype(store)
    int_store = jnp.issubdtype(store_dt, jnp.integer)

    # Ship each chunk in the narrowest exact wire dtype (see _wire_np;
    # measured at 100k x 5k, int16 host / int8 storage: prepare_data 24.8 s
    # with host-dtype uploads vs a 12.6 s bare int8 link floor — benchmarks
    # setup_phases probe). Host validate/downcast per chunk, bare device_put.
    wire_np = (
        _wire_np(Y.dtype, dtype, store_dt) if isinstance(Y, np.ndarray) else None
    )
    if isinstance(Y, np.ndarray):
        shipped_np = wire_np if wire_np is not None else np.dtype(Y.dtype)
        shipped_dt = jnp.dtype(shipped_np.name)
    else:
        shipped_dt = jnp.dtype(Y.dtype)
    chunk = _row_chunk_size(N, G)

    def _host_chunk(i):
        c = Y[i : i + chunk]
        if wire_np is not None and c.dtype != wire_np:
            if int_store:
                _host_check_lossless(c, wire_np, store_dt)
            c = np.ascontiguousarray(c, dtype=wire_np)
        return c

    if isinstance(Y, jax.Array) or shipped_dt == store_dt:
        # Zero-extra-copy case: the shipped matrix IS the stored matrix (or
        # Y is already device-resident). Phase 1 uploads every chunk with no
        # compute dispatch; Phase 2 runs ONE fixed-shape compiled stats
        # program per row block over the device-resident matrix (see
        # _block_stats / _block_stats_table — the latter whenever the
        # shipped dtype is a <=16-bit integer, sidestepping the measured
        # 30-42 s XLA:TPU compile of a 2-D lgamma). Scalar reductions
        # accumulate on device; one host sync after the last block.
        if isinstance(Y, jax.Array):
            Yw = Y  # stats read it in place
        else:
            offs = list(range(0, N, chunk))
            if len(offs) == 1:
                Yw = jnp.asarray(_host_chunk(0))
            else:
                Yw = _fill_rows(
                    zip(offs, (jnp.asarray(c)
                               for c in _prefetched(offs, _host_chunk))),
                    N, G, store_dt,
                )
        table = _stats_table_for(Yw.dtype, dtype)
        block = min(chunk, N)
        nb = -(-N // block)
        s_parts, lb_parts, B_parts = [], [], []
        colsum = jnp.zeros((G,), dtype)
        mx = jnp.full((), -jnp.inf, dtype)
        ni = jnp.zeros((), dtype)
        mn = jnp.full((), jnp.inf, dtype)
        for i in range(nb):
            if table is not None:
                s_b, lb_b, B_b, cs_b, mx_b, ni_b, mn_b = _block_stats_table(
                    Yw, table, log_L_safe, zero_cols, i, block
                )
                mn = jnp.minimum(mn, mn_b)
            else:
                s_b, lb_b, B_b, cs_b, mx_b, ni_b = _block_stats(
                    Yw, log_L_safe, zero_cols, i, block
                )
            if i == nb - 1 and nb * block > N:
                tail = N - i * block  # fresh rows of the clamped tail block
                s_b, lb_b, B_b = (
                    s_b[block - tail :],
                    lb_b[block - tail :],
                    B_b[block - tail :],
                )
            s_parts.append(s_b)
            lb_parts.append(lb_b)
            B_parts.append(B_b)
            colsum = colsum + cs_b
            mx = jnp.maximum(mx, mx_b)
            ni = jnp.maximum(ni, ni_b)
        if table is not None and float(mn) < 0:
            raise ValueError(
                "gene_expression_data must be non-negative raw counts"
            )
        s_all = jnp.concatenate(s_parts) if nb > 1 else s_parts[0]
        lb_all = jnp.concatenate(lb_parts) if nb > 1 else lb_parts[0]
        B_all = jnp.concatenate(B_parts, axis=0) if nb > 1 else B_parts[0]
        ymax = float(mx)
        max_nonint = float(ni)
        Yd = Yw if Yw.dtype == store_dt else Yw.astype(store)
    else:
        # Wire dtype differs from storage (e.g. f32 wire for bfloat16
        # storage, or an int16 wire stored as f32): stream chunk by chunk —
        # upload the wire chunk, run its stats, downcast to storage, FREE
        # the wire chunk — so peak device memory stays
        # O(chunk x G) + N x G x storage_bytes (holding the full wire-dtype
        # matrix alongside the storage copy would be ~3x the storage bytes
        # for bfloat16, breaking the very-large-input contract above).
        # At most two program shapes compile (body + tail).
        table = (
            _stats_table_for(shipped_dt, dtype) if shipped_dt is not None else None
        )
        offs = list(range(0, N, chunk))
        s_parts, lb_parts, B_parts = [], [], []
        colsum = jnp.zeros((G,), dtype)
        ymax = -np.inf
        max_nonint = 0.0
        # multi-chunk: fill a preallocated storage buffer in place
        # (_row_writer) instead of concatenating all parts at the end —
        # the concatenate transiently held TWO full storage copies.
        # _assembly_strategy falls back to the concatenate on backends
        # where donated-write chains are unsafe (axon tunnel).
        strat = _assembly_strategy() if len(offs) > 1 else None
        writer = _row_writer(strat == "donate") if strat in ("donate", "fill") else None
        Yd = jnp.zeros((N, G), dtype=store) if writer is not None else None
        y_parts = [] if strat == "concat" else None
        for off, hc in zip(offs, _prefetched(offs, _host_chunk)):
            yc = jnp.asarray(hc)
            if table is not None:
                s_c, lb_c, B_c, cs, mx_c, ni_c, mn_c = _chunk_stats_table(
                    yc, table, log_L_safe, zero_cols
                )
                if float(mn_c) < 0:
                    raise ValueError(
                        "gene_expression_data must be non-negative raw counts"
                    )
            else:
                yc = yc.astype(dtype)
                s_c, lb_c, B_c, cs, mx_c, ni_c = _chunk_stats(
                    yc, log_L_safe, zero_cols
                )
            s_parts.append(s_c)
            lb_parts.append(lb_c)
            B_parts.append(B_c)
            colsum = colsum + cs
            ymax = max(ymax, float(mx_c))
            max_nonint = max(max_nonint, float(ni_c))
            if writer is not None:
                Yd = writer(Yd, yc.astype(store), jnp.asarray(off, jnp.int32))
            elif y_parts is not None:
                y_parts.append(yc.astype(store))
            else:
                Yd = yc.astype(store)
            del yc
        if y_parts is not None:
            Yd = jnp.concatenate(y_parts, axis=0)
            del y_parts
        s_all = jnp.concatenate(s_parts) if len(s_parts) > 1 else s_parts[0]
        lb_all = jnp.concatenate(lb_parts) if len(lb_parts) > 1 else lb_parts[0]
        B_all = jnp.concatenate(B_parts, axis=0) if len(B_parts) > 1 else B_parts[0]

    if y_storage is not None and jnp.issubdtype(jnp.dtype(y_storage), jnp.integer):
        info = jnp.iinfo(jnp.dtype(y_storage))
        if ymax > info.max:
            raise ValueError(
                f"y_storage={jnp.dtype(y_storage).name} cannot hold the largest "
                f"count ({ymax:.0f} > {info.max}); use int16/bfloat16/float32"
            )
        if max_nonint != 0.0:
            raise ValueError(
                "integer y_storage requires integer counts; found fractional values"
            )

    _check_cells_feasible(B_all)
    return ModelData(
        Y=Yd,
        L=L,
        X=None if x is None else jnp.asarray(x, dtype),
        s=s_all,
        log_binom=lb_all,
        YlogL=B_all,
        colsum_Y=colsum,
    )


def _check_integer_storage(Y, y_storage):
    """Integer y_storage must be lossless: counts integral and in range."""
    if not jnp.issubdtype(jnp.dtype(y_storage), jnp.integer):
        return
    if Y.size == 0:
        return
    info = jnp.iinfo(jnp.dtype(y_storage))
    if float(jnp.max(Y)) > info.max:
        raise ValueError(
            f"y_storage={jnp.dtype(y_storage).name} cannot hold the largest "
            f"count ({float(jnp.max(Y)):.0f} > {info.max}); use "
            "int16/bfloat16/float32"
        )
    # both wrap directions, like _host_check_lossless on the host-wire path:
    # a negative count below the storage's lower bound would wrap positive
    # in the downcast while the precomputed stats used the true value
    if float(jnp.min(Y)) < 0:
        raise ValueError(
            "gene_expression_data must be non-negative raw counts"
        )
    if float(jnp.max(jnp.abs(Y - jnp.round(Y)))) != 0.0:
        raise ValueError(
            "integer y_storage requires integer counts; found fractional values"
        )


def _check_cells_feasible(B):
    """Every cell needs >= 1 clone with finite YlogL. A cell with nonzero
    counts at a zero-copy-number gene in EVERY clone has zero likelihood
    under the whole model: the warm start pins all its clone logits to the
    same floor, its gamma row goes uniform instead of zero, and the
    unmasked ``gamma * (-inf)`` NaNs the entire fit with a misleading
    "inference diverged" error (round-5 review finding). The reference
    would NaN on the same input (TFP ``y * log(0)``, SURVEY §2.4); here it
    is a typed input error instead."""
    if isinstance(B, np.ndarray):  # host-computed stats (sparse path): no
        bad = ~np.isfinite(B).any(axis=1)  # device round-trip for the check
    else:
        bad = ~jnp.any(jnp.isfinite(B), axis=1)
    n_bad = int(bad.sum())
    if n_bad:
        first = int(bad.argmax())
        raise ValueError(
            f"{n_bad} cell(s) have nonzero counts at genes whose copy "
            f"number is 0 in every clone (first: cell {first}) — no clone "
            "can explain them. Remove these cells, or fix the copy-number "
            "matrix (genes with copy number 0 across all clones are "
            "removed by preprocess_for_clonealign)."
        )


def prepare_data_sparse(
    Y, L, x=None, dtype=jnp.float32, y_storage=None, chunk: int = 32_768
) -> ModelData:
    """Build the device-resident data pytree from a scipy CSR/CSC count
    matrix WITHOUT densifying on the host (VERDICT r1 weak item 6: the dense
    path materializes N x G float64 — 4 GB at 100k x 5k — before downcast).

    The derived statistics are computed from the sparse structure in float64
    (lgamma(0+1) = 0, so only stored entries contribute), and the device
    copy of Y — which the likelihood needs dense — is assembled directly in
    the storage dtype from row chunks, so peak host memory is
    O(nnz + chunk x G) instead of O(N x G x 8 bytes).
    """
    import scipy.sparse as sp
    from scipy.special import gammaln

    Y = Y.tocsr()
    N, G = Y.shape
    data64 = Y.data.astype(np.float64)
    L = np.asarray(L, np.float64)
    # validate BEFORE the stats: gammaln(negative) would emit inf-inf NaN
    # warnings from the very pass whose job is to reject the input
    if y_storage is not None:
        _check_integer_storage(data64, y_storage)

    row = np.repeat(np.arange(N), np.diff(Y.indptr))
    s = np.bincount(row, weights=data64, minlength=N)
    sum_lg = np.bincount(row, weights=gammaln(data64 + 1.0), minlength=N)
    log_binom = gammaln(s + 1.0) - sum_lg

    log_L_safe = np.where(L > 0, np.log(np.where(L > 0, L, 1.0)), 0.0)
    B = np.asarray(Y @ log_L_safe)
    hits_zero = np.asarray(Y @ (L <= 0).astype(np.float64)) > 0
    B = np.where(hits_zero, -np.inf, B)

    store = dtype if y_storage is None else y_storage
    np_store = np.dtype(store) if store != jnp.bfloat16 else jnp.bfloat16
    from ..utils.sparsity import device_dense_from_sparse_rows

    Yd = device_dense_from_sparse_rows(Y, np_store, chunk)

    colsum = np.asarray(Y.sum(axis=0)).ravel()
    _check_cells_feasible(np.asarray(B))
    return ModelData(
        Y=Yd,
        L=jnp.asarray(L, dtype),
        X=None if x is None else jnp.asarray(x, dtype),
        s=jnp.asarray(s, dtype),
        log_binom=jnp.asarray(log_binom, dtype),
        YlogL=jnp.asarray(B, dtype),
        colsum_Y=jnp.asarray(colsum, dtype),
    )


# ---------------------------------------------------------------------------
# Initialization (reference R/inference-tflow.R:204-273)
# ---------------------------------------------------------------------------

def _standardize(x, axis=0, ddof=1):
    mu = jnp.mean(x, axis=axis, keepdims=True)
    sd = jnp.std(x, axis=axis, keepdims=True, ddof=ddof)
    return (x - mu) / jnp.where(sd == 0, 1.0, sd)


def randomized_pca(X, k: int, key, oversample: int = 8, power_iters: int = 4):
    """Top-k PCA scores via randomized subspace iteration.

    The reference runs full ``prcomp`` on log2(Y+1)
    (reference R/inference-tflow.R:204) — O(G^3). A randomized range finder
    gives the same top-k subspace with a handful of tall-skinny matmuls,
    which is the TPU-appropriate algorithm at 100k x 5k scale.
    """
    n, g = X.shape
    k_eff = min(k + oversample, min(n, g))
    Xc = _standardize(X, axis=0)
    omega = jax.random.normal(key, (g, k_eff), X.dtype)
    Q = Xc @ omega
    for _ in range(power_iters):
        Q, _ = jnp.linalg.qr(Q)
        Q, _ = jnp.linalg.qr(Xc @ (Xc.T @ Q))
    B = Q.T @ Xc  # (k_eff, g)
    _, _, Vt = jnp.linalg.svd(B, full_matrices=False)
    scores = Xc @ Vt[:k].T  # (n, k)
    return scores


def _row_blocks(N: int, G: int):
    chunk = _row_chunk_size(N, G)
    return [(i, min(i + chunk, N)) for i in range(0, N, chunk)]


def _pca_scores_blocked(
    Y, k: int, key, dtype, oversample: int = 8, power_iters: int = 4
):
    """randomized_pca on log2(Y+1) without ever materializing the full
    standardized N x G matrix: each pass recomputes the per-block
    ``(log2(y+1) - mean) / sd`` slice from the (narrow-dtype) device Y.
    Same algorithm and iteration count as :func:`randomized_pca`; used for
    inputs above ``_CHUNK_ELEMENTS``. The Python block loop unrolls under
    jit, so XLA frees each block's full-precision slice before the next."""
    N, G = Y.shape
    blocks = _row_blocks(N, G)
    k_eff = min(k + oversample, min(N, G))

    def xb(i, j):
        return jnp.log2(Y[i:j].astype(dtype) + 1.0)

    total = jnp.zeros((G,), dtype)
    sumsq = jnp.zeros((G,), dtype)
    for i, j in blocks:
        b = xb(i, j)
        total = total + jnp.sum(b, axis=0)
        sumsq = sumsq + jnp.sum(b * b, axis=0)
    mean = total / N
    var = jnp.maximum(sumsq - N * mean * mean, 0.0) / max(N - 1, 1)
    sd = jnp.sqrt(var)
    sd = jnp.where(sd == 0, 1.0, sd)

    def xcb(i, j):
        return (xb(i, j) - mean[None, :]) / sd[None, :]

    def xc_matmul(M):  # Xc @ M, blocked over rows
        return jnp.concatenate([xcb(i, j) @ M for i, j in blocks], axis=0)

    def xcT_matmul(Q):  # Xc.T @ Q, blocked over rows
        acc = jnp.zeros((G, Q.shape[1]), dtype)
        for i, j in blocks:
            acc = acc + xcb(i, j).T @ Q[i:j]
        return acc

    omega = jax.random.normal(key, (G, k_eff), dtype)
    Q = xc_matmul(omega)
    for _ in range(power_iters):
        Q, _ = jnp.linalg.qr(Q)
        Q, _ = jnp.linalg.qr(xc_matmul(xcT_matmul(Q)))
    B = xcT_matmul(Q).T  # (k_eff, G)
    _, _, Vt = jnp.linalg.svd(B, full_matrices=False)
    return xc_matmul(Vt[:k].T)  # (N, k)


def pca_init_scores(Y, K: int, key, dtype=jnp.float32):
    """Standardized top-K PCA scores of log2(Y+1)
    (reference R/inference-tflow.R:204-207), pre-jitter.

    ``prcomp`` is deterministic, so the reference's restarts all start from
    the SAME scores and differ only through the N(0, 0.05) jitter
    (reference R/inference-tflow.R:208). The restart sweep therefore computes
    this once and shares it across lanes via ``init_params(pca_scores=...)``
    — per-lane randomized PCA was 0.42 s of the 1.0 s headline sweep (the
    tall-skinny QR factorizations serialize across vmap lanes on TPU;
    benchmarks/results_tpu_r3.jsonl probe pca_overhead)."""
    N, G = Y.shape
    if K <= 0:
        return jnp.zeros((N, 0), dtype)
    if N * G > _CHUNK_ELEMENTS:
        pcs = _pca_scores_blocked(Y, K, key, dtype)
    else:
        pcs = randomized_pca(jnp.log2(jnp.asarray(Y, dtype) + 1.0), K, key)
    return _standardize(pcs, axis=0)


def lane0_pca_key(lane_key):
    """The PCA key :func:`init_params` would derive from this restart-lane
    key (the sweep drivers split a lane key into (k_init, k_fit) and
    init_params splits k_init into (k_pca, k_jitter)). Sharing lane 0's
    scores through this key keeps a 1-restart sweep bit-identical to the
    single-fit path (tests/test_entry_point_identity.py)."""
    k_init, _ = jax.random.split(lane_key)
    k_pca, _ = jax.random.split(k_init)
    return k_pca


def data_mu_guess(Y, dtype=jnp.float32):
    """colMeans(Y / rowMeans(Y)) — the data-driven mu initialization
    (reference R/inference-tflow.R:220-231), row-blocked above
    ``_CHUNK_ELEMENTS``. Used as-is (NOT mean-normalized, matching the
    reference's ``data_init_mu=TRUE`` branch)."""
    N, G = Y.shape
    if N * G > _CHUNK_ELEMENTS:
        acc = jnp.zeros((G,), dtype)
        for i, j in _row_blocks(N, G):
            yb = Y[i:j].astype(dtype)
            acc = acc + jnp.sum(yb / jnp.mean(yb, axis=1, keepdims=True), axis=0)
        return acc / N
    Y = jnp.asarray(Y, dtype)
    return jnp.mean(Y / jnp.mean(Y, axis=1, keepdims=True), axis=0)


def init_params(
    Y,
    L,
    key,
    K: int = 1,
    P: int = 0,
    data_init_mu=True,
    dtype=jnp.float32,
    pca_scores=None,
    mu_guess=None,
) -> CloneAlignParams:
    """Initial parameter values (reference R/inference-tflow.R:204-273).

    - psi: PCA of log2(Y+1) (centered+scaled), re-standardized, +N(0,0.05)
    - qmu_loc: inv-softplus of colMeans(Y / rowMeans(Y)) (or ones)
    - everything else zeros

    Above ``_CHUNK_ELEMENTS`` the PCA and mu-guess passes run row-blocked
    (same algorithm, O(block x G) peak full-precision memory) so the init of
    a million-cell fit never materializes N x G in the compute dtype.

    ``pca_scores`` / ``mu_guess`` accept the precomputed outputs of
    :func:`pca_init_scores` / :func:`data_mu_guess` so a restart sweep can
    share the deterministic init passes across lanes (only the psi jitter is
    random per restart, as in the reference); the jitter key stream is
    unchanged either way.
    """
    N, G = Y.shape
    C = L.shape[1]
    k_pca, k_jitter = jax.random.split(key)

    if K > 0:
        pcs = pca_scores if pca_scores is not None else pca_init_scores(Y, K, k_pca, dtype)
        pcs = jnp.asarray(pcs, dtype)
        pcs = pcs + 0.05 * jax.random.normal(k_jitter, pcs.shape, dtype)
    else:
        pcs = jnp.zeros((N, 0), dtype)

    if mu_guess is not None:
        mu_guess = jnp.asarray(mu_guess, dtype)
    elif isinstance(data_init_mu, (bool, np.bool_)):
        if not data_init_mu:
            mu_guess = jnp.ones((G,), dtype)
        else:
            mu_guess = data_mu_guess(Y, dtype)
    else:
        mu_guess = jnp.asarray(data_init_mu, dtype)
        mu_guess = mu_guess / jnp.mean(mu_guess)

    return CloneAlignParams(
        W=jnp.zeros((G, max(K, 0)), dtype),
        chi_unconstr=jnp.zeros((max(K, 0),), dtype),
        psi=pcs.astype(dtype),
        beta=jnp.zeros((G, P), dtype),
        alpha_unconstr=jnp.zeros((C,), dtype),
        qmu_loc=safe_inverse_softplus(mu_guess).astype(dtype),
        qmu_log_scale=jnp.zeros((G,), dtype),
        gamma_logits=jnp.zeros((N, C), dtype),
    )


# ---------------------------------------------------------------------------
# Likelihood + ELBO
# ---------------------------------------------------------------------------

def sample_mu_base(params: CloneAlignParams, key, mc_samples: int):
    """Reparametrized base-normal draws; mu = softplus(base)
    (reference R/inference-tflow.R:258-269)."""
    G = params.qmu_loc.shape[0]
    eps = jax.random.normal(key, (mc_samples, G), params.qmu_loc.dtype)
    return params.qmu_loc[None, :] + jnp.exp(params.qmu_log_scale)[None, :] * eps


# Above this many N x G elements the Z contraction runs gene-blocked: the
# rfe = exp(psi W^T) operand is materialized one gene block at a time (full
# precision) instead of as one N x G tensor. 2^30 elements = 4 GB at f32 —
# the 100k x 5k benchmark path (5e8) keeps the single-block fast path; a
# 1M x 2k fit (2e9, 8 GB rfe) must block to fit 16 GB HBM alongside Y.
_Z_BLOCK_ELEMENTS = 1 << 30


def _compute_Z(params: CloneAlignParams, data: ModelData, mu_samples: jax.Array):
    """Z[s,c,n] = sum_g m[s,g] L[g,c] rfe[n,g] — the per-(sample, clone, cell)
    gene normalizer of the multinomial probabilities
    (reference R/inference-tflow.R:290-291, decomposed; module docstring)."""
    K = params.W.shape[1]
    P = params.beta.shape[1]
    N = data.Y.shape[0]
    G = data.L.shape[0]
    mL = mu_samples[:, None, :] * data.L.T[None, :, :]  # (S, C, G)
    if K > 0 or P > 0:
        def block(sl):
            log_rfe = params.psi @ params.W[sl].T
            if P > 0:
                log_rfe = log_rfe + data.X @ params.beta[sl].T
            return jnp.einsum("scg,ng->scn", mL[:, :, sl], jnp.exp(log_rfe))

        with _z_precision():
            if N * G > _Z_BLOCK_ELEMENTS:
                gb = max(128, (_Z_BLOCK_ELEMENTS // max(N, 1)) // 128 * 128)
                Z = block(slice(0, min(gb, G)))
                for i in range(gb, G, gb):
                    Z = Z + block(slice(i, min(i + gb, G)))
                return Z
            return block(slice(0, G))
    return jnp.sum(mL, axis=2)[:, :, None] * jnp.ones((1, 1, N), mu_samples.dtype)


def _clenshaw(coef: jax.Array, x: jax.Array) -> jax.Array:
    """sum_j coef[..., j] T_j(x_n) via the Clenshaw recurrence.

    coef: (S, C, D+1), x: (N,) in [-1, 1] -> (S, C, N).
    """
    D = coef.shape[-1] - 1
    two_x = 2.0 * x[None, None, :]
    b1 = jnp.zeros(coef.shape[:2] + x.shape, x.dtype)
    b2 = b1
    for j in range(D, 0, -1):
        b1, b2 = two_x * b1 - b2 + coef[..., j : j + 1], b1
    return x[None, None, :] * b1 - b2 + coef[..., 0:1]


@jax.custom_vjp
def cheb_eval(coef: jax.Array, x: jax.Array) -> jax.Array:
    """Chebyshev-series evaluation with an analytic, residual-free VJP.

    Under plain autodiff the D-step Clenshaw recurrence saves every
    intermediate (S, C, N) carry for the backward pass — 2D residual
    tensors, e.g. 640 MB written + read PER STEP at N=500k, D=32, C=10
    (measured as the reason likelihood_impl='z_cheb' fell BEHIND the exact
    normalizer at 500k x 2k on v5e: probe step_attribution_500k,
    benchmarks/results_tpu_r3.jsonl). A Chebyshev series is analytically
    differentiable, so the VJP recomputes instead of storing:

    * d/dx: differentiate the Clenshaw recurrence itself (carry (b, b')
      pairs) — a second fused elementwise chain, no residuals;
    * d/dcoef[..., j] = sum_n cot[..., n] T_j(x_n) — one thin
      (S*C, N) x (N, D+1) matmul against the Chebyshev-Vandermonde
      columns, rebuilt on the fly by the T_j recurrence.
    """
    return _clenshaw(coef, x)


def _cheb_eval_fwd(coef, x):
    return _clenshaw(coef, x), (coef, x)


def _cheb_eval_bwd(res, cot):
    coef, x = res
    D = coef.shape[-1] - 1
    xb = x[None, None, :]
    two_x = 2.0 * xb
    zero = jnp.zeros(coef.shape[:2] + x.shape, x.dtype)
    b1, b2, db1, db2 = zero, zero, zero, zero
    for j in range(D, 0, -1):
        b1, b2, db1, db2 = (
            two_x * b1 - b2 + coef[..., j : j + 1],
            b1,
            2.0 * b1 + two_x * db1 - db2,
            db1,
        )
    # p = x b1 - b2 + c0  =>  dp/dx = b1 + x b1' - b2'
    dpdx = b1 + xb * db1 - db2  # (S, C, N)
    dx = jnp.sum(cot * dpdx, axis=(0, 1))  # (N,)

    cols = [jnp.ones_like(x), x]
    for _ in range(2, D + 1):
        cols.append(2.0 * x * cols[-1] - cols[-2])
    V = jnp.stack(cols, axis=-1)  # (N, D+1)
    # full precision: the cotangent contraction feeds the optimizer's
    # coefficient gradients directly (same rationale as the A-group pin)
    with jax.default_matmul_precision("highest"):
        dcoef = jnp.einsum("scn,nj->scj", cot, V)
    return dcoef, dx


cheb_eval.defvjp(_cheb_eval_fwd, _cheb_eval_bwd)


def _compute_logZ_cheb(params: CloneAlignParams, data: ModelData,
                       mu_samples: jax.Array, degree: int):
    """log Z[s,c,n] for K=1, P=0 by Chebyshev approximation over psi.

    With a single latent dimension the normalizer is a smooth 1-D function
    of each cell's scalar psi:

        Z_c(t) = sum_g mu_sg L_gc exp(w_g t),   log Z_c analytic in t,

    so instead of the O(N x G) exp + contraction per evaluation (the VPU
    exp work is the measured bottleneck of the vmapped sweep — v5e
    micro-probes in benchmarks/results_tpu_r3.jsonl), fit a degree-D
    Chebyshev polynomial to log Z_c over [min psi, max psi] (O(G x D) exps
    + two tiny matmuls) and evaluate it per cell by the Clenshaw recurrence
    — O(D x N x S x C) VPU FMAs, NO gathers (a knot-table + gather variant
    measured 2.9x SLOWER than exact on v5e: TPU gathers serialize).

    Chebyshev converges geometrically for this analytic family: at D=32
    over an 8-sigma psi range the value error is ~1e-13 and the derivative
    error ~1e-11 (offline study; asserted vs the exact path in
    tests/test_z_cheb.py). Gradients flow through the node table
    (d mu, W, L) and the Clenshaw recurrence (d psi); the expansion range
    is stop-gradiented like a constant grid.
    """
    dt = params.psi.dtype
    w = params.W[:, 0]                    # (G,)
    psi = params.psi[:, 0]                # (N,)
    mL = mu_samples[:, None, :] * data.L.T[None, :, :]  # (S, C, G)

    t_min = jax.lax.stop_gradient(jnp.min(psi))
    t_max = jax.lax.stop_gradient(jnp.max(psi))
    mid = 0.5 * (t_min + t_max)
    half = jnp.maximum(0.5 * (t_max - t_min), 1e-6)

    k = jnp.arange(degree + 1, dtype=dt)
    theta = jnp.pi * (k + 0.5) / (degree + 1)
    tk = mid + half * jnp.cos(theta)                    # (D+1,) Chebyshev nodes
    expw = jnp.exp(w[:, None] * tk[None, :])            # (G, D+1)
    # The whole table build is tiny (G x D + D^2 MACs), so it runs at FULL
    # precision: under the MXU's default bf16 inputs the node values
    # (|logZ| ~ 10) round at ~0.04 absolute, which annihilates the small
    # high-order coefficients the transform's cancellation produces —
    # measured as a ~4% systematic ELBO readout bias on v5e before this pin.
    with jax.default_matmul_precision("highest"):
        Zk = jnp.einsum("scg,gk->sck", mL, expw)        # (S, C, D+1)
        fk = jnp.log(Zk)
        # center: the transform then cancels O(spread)~1 values, not O(10)
        f0 = jnp.mean(fk, axis=-1, keepdims=True)
        jj = jnp.arange(degree + 1, dtype=dt)
        M = jnp.cos(jj[:, None] * theta[None, :])       # (D+1, D+1)
        coef = (2.0 / (degree + 1)) * jnp.einsum("sck,jk->scj", fk - f0, M)
    coef = coef.at[..., 0].mul(0.5)
    coef = coef.at[..., 0].add(f0[..., 0])

    x = (psi - mid) / half                              # (N,)
    return cheb_eval(coef, x)                           # (S, C, N)


def _use_z_cheb(config: "ModelConfig") -> bool:
    if config.likelihood_impl != "z_cheb":
        return False
    if config.K != 1 or config.P != 0:
        raise ValueError(
            "likelihood_impl='z_cheb' requires K=1 and no covariates "
            f"(got K={config.K}, P={config.P}); use the default backend"
        )
    return True


def _compute_logZ(params, data, mu_samples, config: "ModelConfig"):
    """log of the gene normalizer, via the configured backend."""
    if _use_z_cheb(config):
        return _compute_logZ_cheb(params, data, mu_samples, config.z_degree)
    return jnp.log(_compute_Z(params, data, mu_samples))


def log_p_y_on_c(
    params: CloneAlignParams,
    data: ModelData,
    mu_base: jax.Array,
    extra_log_lik: Optional[jax.Array] = None,
    config: Optional[ModelConfig] = None,
):
    """(S, C, N) expression log-likelihood, decomposed form (module docstring).

    ``extra_log_lik`` is an optional (N, C) addition — the allele-specific
    beta-binomial term (reference R/inference-tflow.R:302-304).
    """
    mu_samples = softplus(mu_base)  # (S, G)
    log_mu = jnp.log(mu_samples)

    K = params.W.shape[1]
    P = params.beta.shape[1]
    S = mu_samples.shape[0]
    N = data.Y.shape[0]
    C = data.L.shape[1]
    dtype = data.Y.dtype
    config = config or ModelConfig(K=K, P=P, mc_samples=S)

    _check_impl(config)
    # A1[n] = sum_g y_ng * log rfe[n,g]; log rfe = psi W^T (+ X beta^T).
    # (Merging the A1/A2 dots into one Y @ [W|log_mu] matmul was measured
    # SLOWER for bf16-stored Y — 5.35 vs 4.20 ms/step at 100k x 5k x 10 —
    # XLA's fusion of the separate thin dots beats the concatenated one.)
    with _a_precision():
        if K > 0:
            A1 = jnp.sum(params.psi * (data.Y @ params.W), axis=1)  # (N,)
        else:
            A1 = jnp.zeros(N, dtype)
        if P > 0:
            A1 = A1 + jnp.sum(data.X * (data.Y @ params.beta), axis=1)

        A2 = data.Y @ log_mu.T  # (N, S)
    logZ = _compute_logZ(params, data, mu_samples, config)

    ll = (
        data.log_binom[None, None, :]
        + A1[None, None, :]
        + A2.T[:, None, :]
        + data.YlogL.T[None, :, :]
        - data.s[None, None, :] * logZ
    )  # (S, C, N)
    if extra_log_lik is not None:
        ll = ll + extra_log_lik.T[None, :, :]
    return ll


def elbo(
    params: CloneAlignParams,
    data: ModelData,
    key,
    config: ModelConfig,
    extra_log_lik: Optional[jax.Array] = None,
):
    """The evidence lower bound (reference R/inference-tflow.R:298-336).

    Reproduces the reference's exact objective, including its quirks
    (SURVEY.md §2.4): the mu prior is Normal(0,1) on log(mu) *without* a
    Jacobian (item 6), and the Dirichlet prior is evaluated at
    softmax(alpha)+1e-3, off the simplex (item 7).

    **Constant-cotangent decomposition.** The likelihood terms that are the
    same for every clone — log_binom, A1 = sum_g y log rfe, A2 = sum_g y
    log mu — leave the responsibility contraction algebraically:
    ``sum_nc gamma_nc * const_n = sum_n const_n`` because softmax rows sum to
    exactly 1, and a per-cell constant shift of the (n, c) log-likelihood is
    annihilated by the softmax Jacobian, so the gamma_logits gradient is
    unchanged too. Consequences for the training step, at 100k x 5k x 10:

    * ``sum_ns A2 / S = dot(colsum_Y, sum_s log_mu) / S`` — a G-length dot
      with a precomputed constant. Y is no longer read for A2 in the forward
      pass, and its qmu-gradient (``colsum_Y / S``) costs nothing in the
      backward pass.
    * A1 collapses to ``vdot(psi, Y @ W)``; its backward needs one pass over
      Y (``dW = Y^T psi``) — together with the forward ``Y @ W`` these are
      the only two Y passes per step (measured 3.68 -> ~2.7 ms/step in-loop).

    The per-(clone, cell) part — YlogL, the Z normalizer, the allele term —
    stays inside the gamma contraction unchanged.
    """
    S = config.mc_samples
    mu_base = sample_mu_base(params, key, S)
    mu_samples = softplus(mu_base)
    log_mu = jnp.log(mu_samples)

    K = config.K
    P = config.P
    dtype = params.qmu_loc.dtype

    _check_impl(config)
    with _a_precision():
        A1_sum = jnp.zeros((), dtype)
        if K > 0:
            A1_sum = jnp.sum(params.psi * (data.Y @ params.W))
        if P > 0:
            A1_sum = A1_sum + jnp.sum(data.X * (data.Y @ params.beta))
        if data.colsum_Y is not None:
            colsum = data.colsum_Y
        else:  # hand-built ModelData: fall back to an on-the-fly pass
            colsum = jnp.sum(data.Y.astype(dtype), axis=0)
        A2_sum = (
            jnp.vdot(jax.lax.stop_gradient(colsum), jnp.sum(log_mu, axis=0)) / S
        )
    const_sum = jnp.sum(data.log_binom) + A1_sum + A2_sum
    logZ = _compute_logZ(params, data, mu_samples, config)  # (S, C, N)

    clone_ll = data.YlogL.T[None, :, :] - data.s[None, None, :] * logZ
    if extra_log_lik is not None:
        clone_ll = clone_ll + extra_log_lik.T[None, :, :]

    gamma = jax.nn.softmax(params.gamma_logits, axis=1)  # (N, C)
    log_gamma = jax.nn.log_softmax(params.gamma_logits, axis=1)

    E_clone_ll = jnp.mean(clone_ll, axis=0)  # (C, N)
    # xlogy-style guard: a clone with zero copy number at an expressed gene
    # has log-lik -inf; its responsibility is exactly 0 (see
    # gamma_warm_start_logits), and 0 * -inf must contribute 0, not NaN.
    # The -inf is masked BEFORE the multiply (double-where) so the backward
    # pass never sees 0 * inf either.
    safe_ll = jnp.where(gamma == 0, 0.0, E_clone_ll.T)
    EE_p_y = jnp.sum(gamma * safe_ll) + const_sum

    if config.fix_alpha:
        # Documented-but-dead reference flag (SURVEY.md §2.4 item 2),
        # implemented properly: clone priors pinned at uniform.
        log_alpha = jax.nn.log_softmax(jnp.zeros_like(params.alpha_unconstr))
    else:
        log_alpha = jax.nn.log_softmax(params.alpha_unconstr)

    C = log_alpha.shape[0]
    # E_q[log p(theta)] (reference R/inference-tflow.R:322-324)
    dir_conc = 1.0 / C
    dir_x = jnp.exp(log_alpha) + 1e-3
    dirichlet_lp = jnp.sum((dir_conc - 1.0) * jnp.log(dir_x)) - (
        C * jax.lax.lgamma(jnp.asarray(dir_conc, dir_x.dtype))
    )
    E_log_p_p = (
        jnp.sum(log_alpha[None, :] * gamma)
        + jnp.sum(_normal_log_prob(log_mu)) / S
        + dirichlet_lp
    )

    K = config.K
    if K > 0:
        chi = jnp.exp(params.chi_unconstr)
        w_scale = jnp.sqrt(1.0 / chi)  # (K,)
        W_lp = jnp.sum(_normal_log_prob(params.W, 0.0, w_scale[None, :]))
        # Gamma(2, 1): (2-1) log x - x - lgamma(2) = log x - x
        chi_lp = jnp.sum(jnp.log(chi) - chi)
        psi_lp = jnp.sum(_normal_log_prob(params.psi))
        E_log_p_p = E_log_p_p + W_lp + chi_lp + psi_lp

    # E_q[log q] (reference R/inference-tflow.R:332-333). qmu log-prob uses
    # the change of variables through the softplus bijector: with
    # y = base-normal draw, log q(mu) = N(y; loc, scale) - log sigmoid(y).
    scale = jnp.exp(params.qmu_log_scale)
    qmu_lp = _normal_log_prob(mu_base, params.qmu_loc[None, :], scale[None, :])
    qmu_lp = qmu_lp - jax.nn.log_sigmoid(mu_base)
    gamma_entropy_term = jnp.sum(jnp.where(gamma == 0, 0.0, gamma * log_gamma))
    E_log_q = jnp.sum(jnp.mean(qmu_lp, axis=0)) + gamma_entropy_term

    return EE_p_y + E_log_p_p - E_log_q


def gamma_warm_start_logits(
    params: CloneAlignParams,
    data: ModelData,
    key,
    config: ModelConfig,
    initial_shrink: float = 5.0,
    extra_log_lik: Optional[jax.Array] = None,
):
    """Likelihood-based responsibility warm start
    (reference R/inference-tflow.R:338-342,367-369).

    The reference always uses full-strength normalized log-likelihoods. Here
    ``initial_shrink`` is implemented as documented in the reference docs
    (reference R/clonealign.R:16-21, never wired up there — SURVEY.md §2.4
    item 3): logits are scaled by shrink/5, so 0 = uniform init, 5 = the
    reference's exact behavior, 10 = sharper ("semi-hard") assignment.
    """
    mu_base = sample_mu_base(params, key, config.mc_samples)
    p_y = log_p_y_on_c(params, data, mu_base, extra_log_lik, config)  # (S, C, N)
    # SUM over MC samples, not mean — deliberately matching the reference's
    # tf$reduce_sum(p_y_on_c, axis=0) (reference R/inference-tflow.R:337);
    # the subsequent logsumexp normalization absorbs per-cell scale anyway.
    g = jnp.sum(p_y, axis=0)  # (C, N)
    impossible = jnp.isneginf(g)  # zero-CN clone at an expressed gene
    g = g - jax.scipy.special.logsumexp(g, axis=0, keepdims=True)
    logits = (initial_shrink / 5.0) * jnp.maximum(g, -1e30)
    # impossible clones stay impossible at ANY shrink (including 0): their
    # logit is pinned at a finite value whose softmax underflows to exactly
    # 0, which keeps both the ELBO (see elbo()'s masked sum) and Adam's
    # moments finite.
    logits = jnp.where(impossible, -1e30, logits)
    return logits.T  # (N, C)


# ---------------------------------------------------------------------------
# Cell / global ELBO split (streaming fits)
# ---------------------------------------------------------------------------
#
# elbo() is a sum of per-cell terms and global (cell-count-independent)
# terms. The split below lets a driver evaluate the per-cell part one cell
# chunk at a time — with the SAME (S, G) mu draw shared across chunks — and
# add the global part once:
#
#   elbo(params, data, key, ...) ==
#       sum_chunks elbo_cell_terms(params_chunk, data_chunk, mu_base, ...)
#       + elbo_global_terms(params, mu_base, config, data.colsum_Y)
#
# exactly (up to floating-point reduction order across chunk boundaries;
# asserted in tests/test_stream.py). This is the basis of the out-of-HBM
# streaming fit (stream.py): only Y streams through the device, while the
# per-cell variational state stays resident. elbo() itself is untouched.

def elbo_cell_terms(
    params: CloneAlignParams,
    data: ModelData,
    mu_base: jax.Array,
    config: ModelConfig,
    extra_log_lik: Optional[jax.Array] = None,
):
    """The per-cell part of :func:`elbo` for the cells in ``data``.

    ``params.psi`` / ``params.gamma_logits`` carry only this chunk's rows;
    the shared fields (W, chi, beta, alpha, qmu) are the full fit's.
    ``mu_base`` is the (S, G) base-normal draw — pass the SAME draw to every
    chunk of a step (and to :func:`elbo_global_terms`) so the chunk sum is
    the full-batch value. Includes: log_binom + A1 constants, the
    gamma-contracted clone log-likelihood, sum(log_alpha * gamma), the psi
    prior, and (negated) the gamma entropy. Excludes everything in
    :func:`elbo_global_terms`.
    """
    _check_impl(config)
    mu_samples = softplus(mu_base)
    dtype = params.qmu_loc.dtype

    with _a_precision():
        A1_sum = jnp.zeros((), dtype)
        if config.K > 0:
            A1_sum = jnp.sum(params.psi * (data.Y @ params.W))
        if config.P > 0:
            A1_sum = A1_sum + jnp.sum(data.X * (data.Y @ params.beta))
    const_sum = jnp.sum(data.log_binom) + A1_sum
    logZ = _compute_logZ(params, data, mu_samples, config)  # (S, C, N)

    clone_ll = data.YlogL.T[None, :, :] - data.s[None, None, :] * logZ
    if extra_log_lik is not None:
        clone_ll = clone_ll + extra_log_lik.T[None, :, :]

    gamma = jax.nn.softmax(params.gamma_logits, axis=1)  # (N, C)
    log_gamma = jax.nn.log_softmax(params.gamma_logits, axis=1)

    E_clone_ll = jnp.mean(clone_ll, axis=0)  # (C, N)
    safe_ll = jnp.where(gamma == 0, 0.0, E_clone_ll.T)  # see elbo()
    EE_p_y = jnp.sum(gamma * safe_ll) + const_sum

    if config.fix_alpha:
        log_alpha = jax.nn.log_softmax(jnp.zeros_like(params.alpha_unconstr))
    else:
        log_alpha = jax.nn.log_softmax(params.alpha_unconstr)
    E_log_p_cells = jnp.sum(log_alpha[None, :] * gamma)
    if config.K > 0:
        E_log_p_cells = E_log_p_cells + jnp.sum(_normal_log_prob(params.psi))

    gamma_entropy_term = jnp.sum(jnp.where(gamma == 0, 0.0, gamma * log_gamma))
    return EE_p_y + E_log_p_cells - gamma_entropy_term


def elbo_global_terms(
    params: CloneAlignParams,
    mu_base: jax.Array,
    config: ModelConfig,
    colsum_Y: jax.Array,
):
    """The cell-count-independent part of :func:`elbo`: the A2 = Y @ log mu
    constant (via the precomputed per-gene totals), the mu / Dirichlet / W /
    chi priors, and (negated) the qmu entropy. Added ONCE per evaluation,
    regardless of how many chunks the cells were split into."""
    S = config.mc_samples
    mu_samples = softplus(mu_base)
    log_mu = jnp.log(mu_samples)

    with _a_precision():
        A2_sum = (
            jnp.vdot(jax.lax.stop_gradient(colsum_Y), jnp.sum(log_mu, axis=0)) / S
        )

    if config.fix_alpha:
        log_alpha = jax.nn.log_softmax(jnp.zeros_like(params.alpha_unconstr))
    else:
        log_alpha = jax.nn.log_softmax(params.alpha_unconstr)
    C = log_alpha.shape[0]
    dir_conc = 1.0 / C
    dir_x = jnp.exp(log_alpha) + 1e-3
    dirichlet_lp = jnp.sum((dir_conc - 1.0) * jnp.log(dir_x)) - (
        C * jax.lax.lgamma(jnp.asarray(dir_conc, dir_x.dtype))
    )
    E_log_p_glob = jnp.sum(_normal_log_prob(log_mu)) / S + dirichlet_lp
    if config.K > 0:
        chi = jnp.exp(params.chi_unconstr)
        w_scale = jnp.sqrt(1.0 / chi)
        E_log_p_glob = E_log_p_glob + jnp.sum(
            _normal_log_prob(params.W, 0.0, w_scale[None, :])
        )
        E_log_p_glob = E_log_p_glob + jnp.sum(jnp.log(chi) - chi)

    scale = jnp.exp(params.qmu_log_scale)
    qmu_lp = _normal_log_prob(mu_base, params.qmu_loc[None, :], scale[None, :])
    qmu_lp = qmu_lp - jax.nn.log_sigmoid(mu_base)
    E_log_q_glob = jnp.sum(jnp.mean(qmu_lp, axis=0))

    return A2_sum + E_log_p_glob - E_log_q_glob
