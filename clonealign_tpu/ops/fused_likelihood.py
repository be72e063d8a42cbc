"""Pallas TPU kernel: fused multinomial-likelihood contractions.

The decomposed likelihood (models/multinomial.py) needs, per ELBO evaluation:

    A1[n]     = sum_g Y[n,g] * log_rfe[n,g]        log_rfe = psi @ W^T
    A2[n,s]   = sum_g Y[n,g] * log_mu[s,g]
    Z[s,c,n]  = sum_g mu[s,g] * L[g,c] * exp(log_rfe[n,g])

This kernel makes ONE pass over Y per evaluation: for each (cell-tile,
gene-tile) it computes the log_rfe tile (VPU rank-K broadcasts for small K,
MXU otherwise), exponentiates in registers, and accumulates all three
outputs. No N x G tensor ever exists. A custom VJP (same tiling, one more
pass over Y) makes the whole training step two Y-passes total.

Status: RETIRED as a fit backend (round 4) — correct and tested, but XLA's
own fusion of the decomposed likelihood (models/multinomial.py) streams Y
once per pass and measures faster in EVERY probed regime (4.5/4.8 ms vs
11.7/17.5 ms fwd/grad at 100k x 5k x 10 on v5e; the round-3
pallas_vs_xla_regimes sweep found no crossover in S*C, int8 storage, or
tile shape — docs/design.md §2b). ``likelihood_impl="fused"`` now raises;
this module survives as a measured benchmark artifact and Pallas scaffold,
exercised directly by tests/test_fused_likelihood.py (interpret mode) and
tests/test_tpu_hardware.py::test_pallas_kernel_mosaic_compiled (Mosaic).

Covariates fold in by concatenation: log_rfe = [psi, X] @ [W, beta]^T, so
callers pass psi_ext = concat(psi, X) and W_ext = concat(W, beta).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (tests on CPU)."""
    return jax.default_backend() != "tpu"


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _small_k_matmul(a, b_t):
    """a (M, K) x b_t (N, K) -> (M, N) as K broadcast-multiplies on the VPU.

    For K <= ~4 (clonealign: K=1 latent dim, maybe + a covariate or two) a
    rank-K outer-product sum beats an MXU dot padded from K to 128."""
    K = a.shape[1]
    out = a[:, 0:1] * b_t[:, 0][None, :]
    for k in range(1, K):
        out += a[:, k : k + 1] * b_t[:, k][None, :]
    return out


def _fwd_kernel(y_ref, psi_ref, w_ref, logmu_ref, muL_ref, a1_ref, a2_ref, z_ref):
    """Grid (cell_tiles, gene_tiles); gene axis innermost, accumulating into
    per-cell-tile outputs which stay resident in VMEM across the gene loop."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        a1_ref[:] = jnp.zeros_like(a1_ref)
        a2_ref[:] = jnp.zeros_like(a2_ref)
        z_ref[:] = jnp.zeros_like(z_ref)

    y = y_ref[:]  # (TN, TG)
    kf = psi_ref.shape[1]
    if kf <= 4:
        log_rfe = _small_k_matmul(psi_ref[:], w_ref[:])
    else:
        log_rfe = jnp.dot(psi_ref[:], w_ref[:].T, preferred_element_type=jnp.float32)
    # A1 partial: rowsum(Y * log_rfe)
    a1_ref[:] += jnp.sum(y * log_rfe, axis=1, keepdims=True)
    # A2 partial: Y @ log_mu^T  -> (TN, S)
    S = logmu_ref.shape[0]
    if S <= 4:
        for s in range(S):
            a2_ref[:, s : s + 1] += jnp.sum(
                y * logmu_ref[s, :][None, :], axis=1, keepdims=True
            )
    else:
        a2_ref[:] += jnp.dot(y, logmu_ref[:].T, preferred_element_type=jnp.float32)
    # Z partial: rfe @ (mu * L)  -> (TN, S*C)
    rfe = jnp.exp(log_rfe)
    z_ref[:] += jnp.dot(rfe, muL_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tn", "tg"))
def _fused_fwd(Y, psi_ext, W_ext, log_mu, muL, tn=512, tg=1024):
    """Returns (A1 (N,), A2 (N,S), Z_flat (N, S*C))."""
    N, G = Y.shape
    S = log_mu.shape[0]
    SC = muL.shape[1]
    Np, Gp = _cdiv(N, tn) * tn, _cdiv(G, tg) * tg

    Yp = _pad_to(_pad_to(Y, Np, 0), Gp, 1)
    psi_p = _pad_to(psi_ext, Np, 0)
    W_p = _pad_to(W_ext, Gp, 0)
    logmu_p = _pad_to(log_mu, Gp, 1)  # padded genes: log_mu=0 but Y=0 too
    muL_p = _pad_to(muL, Gp, 0)       # padded genes contribute 0 to Z

    grid = (Np // tn, Gp // tg)
    kf = psi_ext.shape[1]

    a1, a2, z = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, tg), lambda i, j: (i, j)),
            pl.BlockSpec((tn, kf), lambda i, j: (i, 0)),
            pl.BlockSpec((tg, kf), lambda i, j: (j, 0)),
            pl.BlockSpec((S, tg), lambda i, j: (0, j)),
            pl.BlockSpec((tg, SC), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, S), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, SC), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, S), jnp.float32),
            jax.ShapeDtypeStruct((Np, SC), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(Yp, psi_p, W_p, logmu_p, muL_p)
    return a1[:N, 0], a2[:N], z[:N]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(
    y_ref, psi_ref, w_ref, muL_ref, da1_ref, da2_ref, dz_ref,
    dpsi_ref, dw_ref, dlogmu_ref, dmuL_ref,
):
    """Grid (gene_tiles, cell_tiles); cell axis innermost. dW/dlogmu/dmuL
    blocks depend only on the gene tile, so they stay VMEM-resident across
    the inner cell loop and accumulate legally. dpsi depends on the cell tile,
    whose block would be revisited non-consecutively across gene tiles —
    instead each gene tile writes its own dpsi partial (cheap: Kf is tiny)
    and the host-side wrapper sums over gene tiles."""
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dlogmu_ref[:] = jnp.zeros_like(dlogmu_ref)
        dmuL_ref[:] = jnp.zeros_like(dmuL_ref)

    y = y_ref[:]  # (TN, TG)
    psi = psi_ref[:]  # (TN, K)
    w = w_ref[:]  # (TG, K)
    kf = psi.shape[1]
    if kf <= 4:
        log_rfe = _small_k_matmul(psi, w)
    else:
        log_rfe = jnp.dot(psi, w.T, preferred_element_type=jnp.float32)
    rfe = jnp.exp(log_rfe)

    dz = dz_ref[:]  # (TN, SC)
    # d rfe[n,g] = sum_sc dz[n,sc] * muL[g,sc]
    drfe = jnp.dot(dz, muL_ref[:].T, preferred_element_type=jnp.float32)  # (TN, TG)
    # d log_rfe = Y * dA1 + rfe * drfe
    dlog_rfe = y * da1_ref[:] + rfe * drfe

    # thin contractions on the VPU (outputs have <=4 columns/rows)
    if kf <= 4:
        for k in range(kf):
            dpsi_ref[0, :, k : k + 1] = jnp.sum(
                dlog_rfe * w[:, k][None, :], axis=1, keepdims=True
            )
            dw_ref[:, k : k + 1] += jnp.sum(
                dlog_rfe * psi[:, k : k + 1], axis=0, keepdims=True
            ).T
    else:
        dpsi_ref[0, :, :] = jnp.dot(dlog_rfe, w, preferred_element_type=jnp.float32)
        dw_ref[:] += jnp.dot(dlog_rfe.T, psi, preferred_element_type=jnp.float32)
    # d log_mu[s,g] += sum_n Y[n,g] dA2[n,s]
    S = da2_ref.shape[1]
    if S <= 4:
        for s in range(S):
            dlogmu_ref[s : s + 1, :] += jnp.sum(
                y * da2_ref[:, s : s + 1], axis=0, keepdims=True
            )
    else:
        dlogmu_ref[:] += jnp.dot(da2_ref[:].T, y, preferred_element_type=jnp.float32)
    # d muL[g,sc] += sum_n rfe[n,g] dz[n,sc]
    dmuL_ref[:] += jnp.dot(rfe.T, dz, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tn", "tg"))
def _fused_bwd(Y, psi_ext, W_ext, muL, dA1, dA2, dZ, tn=512, tg=1024):
    N, G = Y.shape
    S = dA2.shape[1]
    SC = muL.shape[1]
    kf = psi_ext.shape[1]
    Np, Gp = _cdiv(N, tn) * tn, _cdiv(G, tg) * tg

    Yp = _pad_to(_pad_to(Y, Np, 0), Gp, 1)
    psi_p = _pad_to(psi_ext, Np, 0)
    W_p = _pad_to(W_ext, Gp, 0)
    muL_p = _pad_to(muL, Gp, 0)
    dA1_p = _pad_to(dA1[:, None], Np, 0)
    dA2_p = _pad_to(dA2, Np, 0)
    dZ_p = _pad_to(dZ, Np, 0)

    grid = (Gp // tg, Np // tn)

    dpsi, dw, dlogmu, dmuL = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, tg), lambda g, i: (i, g)),
            pl.BlockSpec((tn, kf), lambda g, i: (i, 0)),
            pl.BlockSpec((tg, kf), lambda g, i: (g, 0)),
            pl.BlockSpec((tg, SC), lambda g, i: (g, 0)),
            pl.BlockSpec((tn, 1), lambda g, i: (i, 0)),
            pl.BlockSpec((tn, S), lambda g, i: (i, 0)),
            pl.BlockSpec((tn, SC), lambda g, i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, kf), lambda g, i: (g, i, 0)),
            pl.BlockSpec((tg, kf), lambda g, i: (g, 0)),
            pl.BlockSpec((S, tg), lambda g, i: (0, g)),
            pl.BlockSpec((tg, SC), lambda g, i: (g, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Gp // tg, Np, kf), jnp.float32),
            jax.ShapeDtypeStruct((Gp, kf), jnp.float32),
            jax.ShapeDtypeStruct((S, Gp), jnp.float32),
            jax.ShapeDtypeStruct((Gp, SC), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(Yp, psi_p, W_p, muL_p, dA1_p, dA2_p, dZ_p)
    return dpsi.sum(axis=0)[:N], dw[:G], dlogmu[:, :G], dmuL[:G]


# ---------------------------------------------------------------------------
# Public custom-VJP op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_likelihood_terms(Y, psi_ext, W_ext, log_mu, muL):
    """Compute (A1, A2, Z_flat) — see module docstring.

    Args:
      Y:       (N, G) counts, f32. Not differentiated.
      psi_ext: (N, Kf) cell factors (psi, or concat(psi, X)).
      W_ext:   (G, Kf) gene loadings (W, or concat(W, beta)).
      log_mu:  (S, G) log of the sampled mu.
      muL:     (G, S*C) mu[s,g] * L[g,c], flattened (s, c) -> column s*C+c.

    Returns:
      A1 (N,), A2 (N, S), Z_flat (N, S*C).
    """
    return _fused_fwd(Y, psi_ext, W_ext, log_mu, muL)


def _vjp_fwd(Y, psi_ext, W_ext, log_mu, muL):
    out = _fused_fwd(Y, psi_ext, W_ext, log_mu, muL)
    return out, (Y, psi_ext, W_ext, muL)


def _vjp_bwd(res, cotangents):
    Y, psi_ext, W_ext, muL = res
    dA1, dA2, dZ = cotangents
    dpsi, dw, dlogmu, dmuL = _fused_bwd(Y, psi_ext, W_ext, muL, dA1, dA2, dZ)
    return None, dpsi, dw, dlogmu, dmuL


fused_likelihood_terms.defvjp(_vjp_fwd, _vjp_bwd)


def reference_likelihood_terms(Y, psi_ext, W_ext, log_mu, muL):
    """Pure-XLA implementation of the same contract (materializes rfe)."""
    log_rfe = psi_ext @ W_ext.T
    rfe = jnp.exp(log_rfe)
    A1 = jnp.sum(Y * log_rfe, axis=1)
    A2 = Y @ log_mu.T
    Z = rfe @ muL
    return A1, A2, Z
