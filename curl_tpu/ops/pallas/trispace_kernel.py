"""Fused tri-space polynomial residual as a single Pallas TPU kernel.

One grid step processes a (SUB, 128) tile of flattened pixels entirely in
VMEM: RGB -> Lab/HSV conversion, normalized coordinate generation, the full
126-monomial degree-4 polynomial per space (incremental chain — one multiply
per monomial), the 9 coefficient contractions as scalar-broadcast FMAs on
the VPU, sigmoid, Lab/HSV -> RGB back-conversion, and the residual sum.
Nothing but the input tile, the coefficients and the output tile ever
touches HBM — the (H, W, 126) monomial tensor the reference materializes
(/root/reference/model.py:319-321) never exists.

Layout: planar (B, 3, P/128, 128) — pixel index is flattened (row-major)
so W need not be a multiple of 128; x/y coordinates are recovered from the
flat index arithmetically. The per-space (3, num_coeffs) coefficient
matrices ride along in SMEM and are read as scalars (broadcast against the
tile) inside the unrolled chain.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from curl_tpu.ops import color_planes as cp
from curl_tpu.ops import poly

SUBLANES = 32  # rows per tile; 32x128 = 4096 pixels per grid step
LANES = 128

# Per-pallas_call grid-size bound. Round-1 observed worker instability with
# single huge multi-image grids on the tunneled v5e; round-2 measurements
# (tools/kernel_bench.py, docs/ROOFLINE.md) show that *several* bounded
# calls inside one jit are stable (8x507-step calls ran fine), so arbitrary
# batch/resolution work is chunked into <=MAX_BLOCKS_PER_CALL-step calls —
# one per image, plus row-range chunks within an image when a single image
# exceeds the bound (4K = 2025 blocks -> 4 calls). 512 keeps 1080p (507
# blocks at SUBLANES=32) in exactly one call.
MAX_BLOCKS_PER_CALL = 512


def _chain_eval(vars5, coeff_read, degree, num_vars, acc_init):
    """Evaluate the polynomial for 3 output channels over one tile.

    vars5: tuple of V planes. coeff_read(c, k) -> scalar. Returns 3 planes.
    Monomials are built by the incremental chain (parent * variable); Python
    lists hold the live planes, Mosaic's liveness analysis keeps only
    parents of not-yet-emitted monomials in VMEM.
    """
    chain = poly.monomial_chain(degree, num_vars)
    ones = jnp.ones_like(vars5[0])
    monos = [ones]
    accs = list(acc_init)
    for c in range(3):
        accs[c] = accs[c] + coeff_read(c, 0)  # constant term
    for k, (parent, var) in enumerate(chain, start=1):
        m = monos[parent] * vars5[var]
        monos.append(m)
        for c in range(3):
            accs[c] = accs[c] + coeff_read(c, k) * m
    return accs


def _make_kernel(degree: int, spatial: bool, width: int, height: int,
                 total_h: int, total_w: int, out_dtype, composite: bool = False):
    """`composite=True` emits clip(img + residual, 0, 1) instead of the raw
    residual — the deployment path's generate_image fused into the same
    VMEM pass, saving one full HBM read+write of the image."""
    num_vars = 3 + 2 * int(spatial)

    def kernel(scalar_ref, coeff_ref, img_ref, out_ref):
        pid = pl.program_id(1)
        r = img_ref[0, 0].astype(jnp.float32)
        g = img_ref[0, 1].astype(jnp.float32)
        b = img_ref[0, 2].astype(jnp.float32)

        if spatial:
            # scalar_ref[0,0] = band row offset (dynamic tiled apply);
            # scalar_ref[0,1] = flat-pixel offset of this chunk within the
            # image, so one compiled binary serves every row chunk of a
            # >MAX_BLOCKS_PER_CALL-block image.
            base = pid * (SUBLANES * LANES) + scalar_ref[0, 1]
            idx = (
                base
                + jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
            )
            col = idx % width
            row = idx // width
            xplane = col.astype(jnp.float32) / total_w
            # Dynamic row offset: one compiled program serves every row band
            # of a tiled apply.
            yplane = (row + scalar_ref[0, 0]).astype(jnp.float32) / total_h
            coords = (xplane, yplane)
        else:
            coords = ()

        res_r = jnp.zeros_like(r)
        res_g = jnp.zeros_like(r)
        res_b = jnp.zeros_like(r)
        zero = jnp.zeros_like(r)

        for space in range(3):
            if space == 0:
                planes = (r, g, b)
            elif space == 1:
                planes = cp.lab_from_rgb(r, g, b)
            else:
                planes = cp.hsv_from_rgb(r, g, b)

            def coeff_read(c, k, _s=space):
                return coeff_ref[0, _s * 3 + c, k]

            o0, o1, o2 = _chain_eval(
                planes + coords, coeff_read, degree, num_vars, (zero, zero, zero)
            )
            o0 = jax.nn.sigmoid(o0)
            o1 = jax.nn.sigmoid(o1)
            o2 = jax.nn.sigmoid(o2)
            if space == 1:
                o0, o1, o2 = cp.rgb_from_lab(o0, o1, o2)
            elif space == 2:
                o0, o1, o2 = cp.rgb_from_hsv(o0, o1, o2)
            res_r = res_r + 2.0 * (o0 - 0.5)
            res_g = res_g + 2.0 * (o1 - 0.5)
            res_b = res_b + 2.0 * (o2 - 0.5)

        if composite:
            res_r = jnp.clip(r + res_r, 0.0, 1.0)
            res_g = jnp.clip(g + res_g, 0.0, 1.0)
            res_b = jnp.clip(b + res_b, 0.0, 1.0)
        out_ref[0, 0] = res_r.astype(out_dtype)
        out_ref[0, 1] = res_g.astype(out_dtype)
        out_ref[0, 2] = res_b.astype(out_dtype)

    return kernel


def _fused_forward(
    img: Array,
    coeff_rgb: Array,
    coeff_lab: Array,
    coeff_hsv: Array,
    row0: Array,
    degree: int,
    spatial: bool,
    static_tile: tuple,
    composite: bool = False,
) -> Array:
    b, h, w, _ = img.shape
    col0, th, tw = static_tile
    n = poly.num_monomials(degree, 3 + 2 * int(spatial))

    p = h * w
    block_px = SUBLANES * LANES
    blocks = -(-p // block_px)
    padded = blocks * block_px

    # NHWC -> planar flattened (B, 3, rows, 128).
    planar = img.transpose(0, 3, 1, 2).reshape(b, 3, p)
    if padded != p:
        planar = jnp.pad(planar, ((0, 0), (0, 0), (0, padded - p)))
    planar = planar.reshape(b, 3, padded // LANES, LANES)

    coeffs = jnp.concatenate([coeff_rgb, coeff_lab, coeff_hsv], axis=1)  # (B, 9, N)
    coeffs = coeffs.astype(jnp.float32)

    kernel = _make_kernel(degree, spatial, w, h, th, tw, img.dtype, composite)
    row0_i32 = row0.astype(jnp.int32)
    block_rows = SUBLANES  # rows of the (padded//LANES, LANES) layout per block

    def make_call(nbatch, nblocks):
        return pl.pallas_call(
            kernel,
            grid=(nbatch, nblocks),
            in_specs=[
                pl.BlockSpec((1, 2), lambda bi, i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 9, n), lambda bi, i: (bi, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, 3, SUBLANES, LANES),
                    lambda bi, i: (bi, 0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 3, SUBLANES, LANES),
                lambda bi, i: (bi, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (nbatch, 3, nblocks * block_rows, LANES), img.dtype
            ),
            cost_estimate=pl.CostEstimate(
                flops=int(nbatch * nblocks * block_px * 3 * (2 * n * 3 + n + 200)),
                bytes_accessed=int(nbatch * nblocks * block_px * 3 * 2 * img.dtype.itemsize),
                transcendentals=int(nbatch * nblocks * block_px * 24),
            ),
            # Images are independent (parallel); blocks within an image
            # pipeline sequentially (arbitrary). Declaring this is worth
            # ~4% per image at batch 8, and lets XLA fuse the NHWC->planar
            # relayout into the operand (measured, docs/ROOFLINE.md r3).
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )

    # The CPU backend only runs pallas in interpret mode ("Only interpret
    # mode is supported on CPU backend"); entering the TPU interpreter here
    # keeps the pallas path usable on dev machines and CPU-forced smokes.
    # The context is a trace-time flag, so this composes with an outer jit.
    import contextlib

    interp_ctx = (
        pltpu.force_tpu_interpret_mode()
        if jax.default_backend() == "cpu"
        else contextlib.nullcontext()
    )

    if blocks <= MAX_BLOCKS_PER_CALL:
        # Whole batch in ONE (image, block) 2-D grid — measured faster than
        # per-image bounded calls (1.51 vs 1.59 ms/img at 1080p batch 8,
        # tools/batch_grid_probe.py / docs/ROOFLINE.md) and inside the
        # stability envelope: the per-call STEP count is what must stay
        # bounded, and each (bi, :) row of the grid is <= MAX_BLOCKS_PER_CALL
        # steps of double-buffered (SUB, 128) tiles.
        scalars = jnp.stack([row0_i32, jnp.int32(0)]).reshape(1, 2)
        with interp_ctx:
            out = make_call(b, blocks)(scalars, coeffs, planar)
    else:
        # High-res: row-range chunks within each image keep every call's
        # grid bounded (e.g. 4K = 2025 blocks -> 4 calls/image). All calls
        # live inside the same jitted program — multiple bounded calls are
        # stable where one huge grid was not (see module docstring).
        calls = {}
        outs = []
        with interp_ctx:
            for i in range(b):
                chunks = []
                for c0 in range(0, blocks, MAX_BLOCKS_PER_CALL):
                    nb = min(MAX_BLOCKS_PER_CALL, blocks - c0)
                    if nb not in calls:
                        calls[nb] = make_call(1, nb)
                    scalars = jnp.stack(
                        [row0_i32, jnp.int32(c0 * block_px)]
                    ).reshape(1, 2)
                    sl = planar[i : i + 1, :, c0 * block_rows : (c0 + nb) * block_rows, :]
                    chunks.append(calls[nb](scalars, coeffs[i : i + 1], sl))
                outs.append(
                    jnp.concatenate(chunks, axis=2) if len(chunks) > 1 else chunks[0]
                )
        out = jnp.concatenate(outs, axis=0) if b > 1 else outs[0]

    out = out.reshape(b, 3, padded)[:, :, :p].reshape(b, 3, h, w)
    return out.transpose(0, 2, 3, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_vjp(img, c_rgb, c_lab, c_hsv, row0, degree, spatial, static_tile,
               composite):
    return _fused_forward(
        img, c_rgb, c_lab, c_hsv, row0, degree, spatial, static_tile, composite
    )


def _fused_vjp_fwd(img, c_rgb, c_lab, c_hsv, row0, degree, spatial, static_tile,
                   composite):
    out = _fused_forward(
        img, c_rgb, c_lab, c_hsv, row0, degree, spatial, static_tile, composite
    )
    return out, (img, c_rgb, c_lab, c_hsv, row0)


def _fused_vjp_bwd(degree, spatial, static_tile, composite, residuals, g):
    # Backward through the mathematically identical XLA implementation —
    # training at crop resolution is backbone/SSIM-dominated, so the fused
    # forward is where the win is.
    from curl_tpu.ops import enhance

    img, c_rgb, c_lab, c_hsv, row0 = residuals
    col0, th, tw = static_tile

    def ref(im, a, b, c):
        res = enhance.trispace_residual(
            im, a, b, c, degree=degree, spatial=spatial, impl="xla",
            tile=(row0, col0, th, tw),
        )
        return enhance.generate_image(im, res) if composite else res

    _, vjp = jax.vjp(ref, img, c_rgb, c_lab, c_hsv)
    return vjp(g) + (jnp.zeros_like(row0, dtype=jnp.float32),)


_fused_vjp.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_trispace_residual(
    img: Array,
    coeff_rgb: Array,
    coeff_lab: Array,
    coeff_hsv: Array,
    row0=None,
    *,
    degree: int = 4,
    spatial: bool = True,
    static_tile: Optional[tuple] = None,
    tile: Optional[tuple] = None,
    composite: bool = False,
) -> Array:
    """Drop-in fused equivalent of the XLA `trispace_residual` path.

    img: (B, H, W, 3); coeffs: (B, 3, N) each. Tiling: either pass `tile` =
    (row_offset, col_offset, total_h, total_w) like the XLA path, or the
    split form `row0` (dynamic scalar) + `static_tile` = (col_offset,
    total_h, total_w). col_offset must be 0 and the band must span the full
    width. `composite=True` returns clip(img + residual, 0, 1) computed in
    the same VMEM pass (the deployment composite fused in — one fewer full
    HBM round trip). Differentiable: the custom VJP routes the backward
    pass through the XLA implementation.
    """
    b, h, w, _ = img.shape
    if tile is not None:
        row0, col0, th, tw = tile
    elif static_tile is not None:
        col0, th, tw = static_tile
        row0 = 0 if row0 is None else row0
    else:
        row0, col0, th, tw = 0, 0, h, w
    row0 = jnp.asarray(row0, jnp.float32)
    if col0 != 0 or tw != w:
        raise NotImplementedError(
            "pallas path tiles over full-width row bands only"
        )
    n = poly.num_monomials(degree, 3 + 2 * int(spatial))
    for name, c in (("rgb", coeff_rgb), ("lab", coeff_lab), ("hsv", coeff_hsv)):
        if c.shape != (b, 3, n):
            raise ValueError(f"coeff_{name} must be {(b, 3, n)}; got {c.shape}")
    return _fused_vjp(
        img, coeff_rgb, coeff_lab, coeff_hsv, row0, degree, spatial,
        (col0, th, tw), composite,
    )
