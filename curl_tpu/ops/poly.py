"""Multivariate-polynomial image transforms.

The live CURL model predicts, per image and per output channel, the
coefficients of a total-degree <= D polynomial in V variables (V=5: R,G,B and
the two normalized spatial coordinates). This module provides:

  * `monomial_powers(degree, num_vars)` — exponent tuples in *graded
    colex-compatible order*, provably identical to the ordering the PyTorch
    reference uses (reference model.py:223-246, `generate_powers`), so
    converted checkpoints index coefficients identically. Implementation here
    is independent: `itertools.combinations_with_replacement` per degree.
  * `monomial_chain(degree, num_vars)` — an incremental evaluation plan:
    every degree-d monomial equals a degree-(d-1) monomial times one variable,
    so the whole basis costs one multiply per monomial. This is what both the
    XLA path and the Pallas kernel use instead of materializing
    `pow(img, powers)` broadcasts like the reference (model.py:319-321).
  * `poly_apply(img, coeffs, ...)` — evaluates the polynomial per pixel and
    contracts with per-image coefficients (reference
    `ChannelPolyLayer.forward`, model.py:295-333), via chained 2-D
    scalar-broadcast accumulation (see `_eval_flat` for why not a matmul).

Terminology matches the reference: `num_coeffs = C(V+D, D)`; for the flagship
degree-4, 5-variable transform that is 126 monomials.
"""

from __future__ import annotations

import itertools
import math
from functools import lru_cache, partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def num_monomials(degree: int, num_vars: int) -> int:
    """C(num_vars + degree, degree): size of the total-degree-<=D basis in V
    variables (reference `ChannelPolyLayer.ncr`, model.py:288-293)."""
    return math.comb(num_vars + degree, degree)


@lru_cache(maxsize=None)
def monomial_powers(degree: int, num_vars: int) -> tuple[tuple[int, ...], ...]:
    """Exponent tuples for all monomials of total degree <= `degree`.

    Ordering: ascending total degree; within a degree, the order produced by
    `itertools.combinations_with_replacement(range(num_vars), d)` mapped to
    exponent counts — i.e. for degree 2 in (x, y): x^2, xy, y^2. This graded
    order equals the reference generator's order (model.py:223-246); the unit
    tests assert equality for every (degree, vars) combination used.
    """
    if degree < 0 or num_vars < 0:
        raise ValueError("degree and num_vars must be non-negative")
    out: list[tuple[int, ...]] = []
    for d in range(degree + 1):
        for combo in itertools.combinations_with_replacement(range(num_vars), d):
            exps = [0] * num_vars
            for v in combo:
                exps[v] += 1
            out.append(tuple(exps))
    return tuple(out)


@lru_cache(maxsize=None)
def monomial_chain(degree: int, num_vars: int) -> tuple[tuple[int, int], ...]:
    """Incremental plan: for each monomial k (skipping the constant term at
    index 0) a pair (parent_index, var_index) such that
    ``m[k] = m[parent] * x[var]``. One multiply per basis element."""
    powers = monomial_powers(degree, num_vars)
    index = {p: i for i, p in enumerate(powers)}
    plan: list[tuple[int, int]] = []
    for p in powers[1:]:
        # Remove one unit from the first nonzero exponent -> parent monomial.
        v = next(i for i, e in enumerate(p) if e > 0)
        parent = list(p)
        parent[v] -= 1
        plan.append((index[tuple(parent)], v))
    return tuple(plan)


def monomial_basis(channels: Sequence[Array], degree: int) -> Array:
    """Stack the full monomial basis along a new trailing axis.

    `channels` is a sequence of V same-shaped arrays (one per polynomial
    variable). Returns shape (*spatial, num_coeffs). Built with the
    incremental chain — never computes a `pow`.
    """
    num_vars = len(channels)
    plan = monomial_chain(degree, num_vars)
    terms: list[Array] = [jnp.ones_like(channels[0])]
    for parent, var in plan:
        terms.append(terms[parent] * channels[var])
    return jnp.stack(terms, axis=-1)


# Pixels processed per chunk when evaluating huge images. Bounds the
# transient monomial-basis buffer to chunk * num_coeffs floats per batch row
# (~128 MB fp32 for 2^18 pixels x 126 terms at batch 1) instead of
# materializing (B, H, W, N) for the whole image — which is exactly what the
# reference does (model.py:319-321) and what OOMs at high resolution.
_DEFAULT_CHUNK = 1 << 18


def _eval_flat(flat: Array, coeffs_t: Array, degree: int) -> Array:
    """(B, P, V) pixels -> (B, P, num_out) via the incremental monomial
    chain with scalar-broadcast accumulation, strictly in 2-D (B, P)
    arithmetic.

    Deliberately NOT a materialized (B, P, N) basis + matmul: on TPU the
    XLA compiler repeatedly materializes the basis-concat operands (and,
    under autodiff, the saved chain values) as (B, P, 1) buffers whose
    (8, 128) tile padding inflates them 128x — observed as 27-28 GB compile
    failures at 256px batch 7 in both training and evaluation graphs. The
    accumulation form keeps every intermediate a clean 2-D tile; the lost
    MXU matmul only reached ~7% utilization (N=num_out=3) anyway, and the
    fused Pallas kernel is the fast path for bulk inference."""
    v = flat.shape[-1]
    num_out = coeffs_t.shape[-1]
    channels = [flat[..., i] for i in range(v)]
    plan = monomial_chain(degree, v)
    ones = jnp.ones_like(channels[0])  # (B, P)
    terms = [ones]
    # Strictly 2-D (B, P) arithmetic: even an (..., 1) expand-dims broadcast
    # operand materializes with (8, 128) tile padding on TPU, which is what
    # this path exists to avoid. Coefficients broadcast as (B, 1) scalars.
    accs = [coeffs_t[:, 0, c][:, None] * ones for c in range(num_out)]
    for k, (parent, var) in enumerate(plan, start=1):
        m = terms[parent] * channels[var]
        terms.append(m)
        for c in range(num_out):
            accs[c] = accs[c] + coeffs_t[:, k, c][:, None] * m
    return jnp.stack(accs, axis=-1)


def _eval_flat_matmul(flat: Array, coeffs_t: Array, degree: int) -> Array:
    """(B, P, V) pixels -> (B, P, num_out) with the monomial basis stacked
    on axis 0 — (N, B, P), whose trailing (B, P) dims tile cleanly (the
    round-1 compile blowup came from (B, P, 1) concat operands padding
    1 -> 128, which axis-0 stacking avoids) — contracted with an einsum the
    compiler runs on the MXU.

    Measured on the real v5e (tools/poly_grad_probe.py, 256^2 batch 8,
    tri-space residual fwd+bwd wrt coefficients): accumulation form
    3.5 ms/step, this matmul form 5.8 ms/step — XLA already fuses the
    accumulation chain's backward well, and the stacked basis pays an
    extra HBM round trip. Kept as an experimental alternative (and as the
    measurement that *rules it out*); "acc" stays the default everywhere.

    HIGHEST matmul precision: the contraction mixes coefficients spanning
    orders of magnitude; single-pass bf16 loses parity with the fp32
    reference (CLAUDE.md). The cost is negligible — the contraction is
    ~0.4 GFLOP where the basis chain is the real work.
    """
    v = flat.shape[-1]
    channels = [flat[..., i] for i in range(v)]
    plan = monomial_chain(degree, v)
    terms = [jnp.ones_like(channels[0])]
    for parent, var in plan:
        terms.append(terms[parent] * channels[var])
    basis = jnp.stack(terms, axis=0)  # (N, B, P)
    return jnp.einsum(
        "nbp,bnc->bpc", basis, coeffs_t, precision=jax.lax.Precision.HIGHEST
    )



@partial(jax.jit, static_argnames=("degree", "num_out", "chunk_pixels", "form"))
def poly_apply(
    img: Array,
    coeffs: Array,
    *,
    degree: int = 4,
    num_out: int = 3,
    chunk_pixels: int = _DEFAULT_CHUNK,
    form: str = "acc",
) -> Array:
    """Per-pixel polynomial transform with per-image coefficients.

    Args:
      img: (B, H, W, V) — V polynomial variables per pixel (e.g. 3 color
        channels + 2 normalized coordinates).
      coeffs: (B, num_out, num_coeffs) — per-image coefficients, same
        layout/ordering as the reference `ChannelPolyLayer.forward`
        (model.py:295-333).
      degree: total polynomial degree.
      num_out: output channels.
      chunk_pixels: evaluate at most this many pixels at a time (scanned),
        bounding the transient basis buffer at high resolution.
      form: "acc" (scalar-broadcast accumulation; minimal live buffers and
        measured fastest both forward and under autodiff — the default) or
        "matmul" (axis-0-stacked basis + MXU einsum, kept for measurement;
        see `_eval_flat_matmul`). Chunked evaluation always uses "acc"
        (the chunk bound exists to avoid materializing a basis at all).

    Returns:
      (B, H, W, num_out).
    """
    b, h, w, v = img.shape
    n = num_monomials(degree, v)
    if coeffs.shape != (b, num_out, n):
        raise ValueError(
            f"coeffs must be (batch, {num_out}, {n}); got {coeffs.shape}"
        )
    flat = img.reshape(b, h * w, v)
    coeffs_t = coeffs.transpose(0, 2, 1).astype(flat.dtype)

    p = h * w
    # Symbolic dims (jax.export shape polymorphism) can't be compared against
    # the chunk bound; export paths take the unchunked branch.
    if not isinstance(p, int) or p <= chunk_pixels:
        eval_fn = _eval_flat_matmul if form == "matmul" else _eval_flat
        out = eval_fn(flat, coeffs_t, degree)
    else:
        n_chunks = -(-p // chunk_pixels)
        padded = n_chunks * chunk_pixels
        if padded != p:
            flat = jnp.pad(flat, ((0, 0), (0, padded - p), (0, 0)))
        # (chunks, B, chunk, V); scan keeps one chunk's basis live at a time.
        chunked = flat.reshape(b, n_chunks, chunk_pixels, v).transpose(1, 0, 2, 3)
        out = jax.lax.map(lambda x: _eval_flat(x, coeffs_t, degree), chunked)
        out = out.transpose(1, 0, 2, 3).reshape(b, padded, num_out)[:, :p]
    return out.reshape(b, h, w, num_out).astype(img.dtype)


def poly_string(img_name: str, coeff_name: str, degree: int, num_vars: int) -> str:
    """Human-readable polynomial expression for export/codegen — role of the
    reference's `generate_poly_string` (model.py:248-262)."""
    terms = []
    for k, powers in enumerate(monomial_powers(degree, num_vars)):
        factors = [f"{coeff_name}[{k}]"]
        for idx, p in enumerate(powers):
            if p == 1:
                factors.append(f"{img_name}[{idx}]")
            elif p > 1:
                factors.append(f"({img_name}[{idx}]**{p})")
        terms.append("*".join(factors))
    return " + ".join(terms)


def powers_array(degree: int, num_vars: int) -> np.ndarray:
    """(num_coeffs, num_vars) int array of exponents — the converter checks
    this against a torch checkpoint's stored `powers` buffer to validate
    coefficient ordering."""
    return np.array(monomial_powers(degree, num_vars), dtype=np.int32)
