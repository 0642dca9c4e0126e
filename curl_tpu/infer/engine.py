"""Inference engine: predict-on-low-res, apply-on-full-res, tiled 4K+.

The deployment-time workflow of the reference's `infer.py`: the backbone
sees a small (e.g. 320x320) crop to predict the 1134 coefficients, and the
polynomial transform is applied at arbitrary resolution
(reference infer.py:32-47, model.py:529-535). The transform is constant-size
regardless of image size, so this scales to any resolution; `tile_rows`
streams the apply in row bands (with globally-normalized coordinates) to
bound HBM at very high resolutions — the pixel-space analog of sequence
parallelism.
"""

from __future__ import annotations


import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from curl_tpu.models.curl_curve import CurlCurveNet
from curl_tpu.models.trispace import TriSpacePolyNet
from curl_tpu.ops import enhance

# Whole-image apply programs above this many pixels PER IMAGE automatically
# stream in row bands. Calibrated on the v5e (docs/ROOFLINE.md): a whole
# 8K image (33.2 Mpx) OOMs HBM (15.82 G of 15.75 G), while 4K (8.3 Mpx)
# and batch-32 1080p programs are stable — so the bound is per-image, not
# per-batch, and 16.8 Mpx sits safely between the known-good 8.3 Mpx and
# the known-bad 33.2 Mpx. Bands target HALF the bound for 2x headroom
# (8K -> 1088-row bands, matching the hardware-verified tile_rows=1080 run).
AUTO_TILE_PIXELS = 16_777_216


def _norm_u8(x, scale: bool):
    """uint8 wire format -> fp32: images scale by 1/255, masks just cast.
    Float inputs pass through. ONE definition serves both the fused
    whole-image program and the banded path so the wire contract can't
    drift between them."""
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32)
        return x / 255.0 if scale else x
    return x


def auto_tile_rows(height: int, width: int, budget_px: int = AUTO_TILE_PIXELS):
    """None if a whole-image program fits the HBM heuristic, else a row-band
    height (multiple of 32 sublanes, min 32) targeting budget_px/2 pixels."""
    if height * width <= budget_px:
        return None
    rows = max(32, (budget_px // 2 // max(1, width)) // 32 * 32)
    return min(rows, height)


class Enhancer:
    """Wraps a trained TriSpacePolyNet — or CurlCurveNet — for
    deployment-style inference. Both share the predict-on-low-res /
    apply-on-full-res contract; the coefficient/tiled-band helpers are
    polynomial-model-only (the curve model's whole apply is one fused
    pass)."""

    def __init__(
        self,
        model: TriSpacePolyNet,
        variables,
        backbone_size: int = 320,
        impl: str = "xla",
        out_u8: bool = False,
        auto_tile_pixels: Optional[int] = None,
        donate_target: bool = False,
    ):
        self.model = model
        # Read-only (property below): _serve_fn closes over the variables at
        # construction, so reassigning them later would silently serve stale
        # weights through enhance_stream. Build a new Enhancer per checkpoint.
        self._variables = variables
        self.backbone_size = backbone_size
        self.impl = impl
        self.out_u8 = out_u8
        # Per-image pixel bound above which enhance_image auto-streams row
        # bands (polynomial models; see auto_tile_rows). None = the module
        # default (the single source of truth for the v5e calibration).
        self.auto_tile_pixels = (
            AUTO_TILE_PIXELS if auto_tile_pixels is None else auto_tile_pixels
        )
        self._coeff_fn = jax.jit(
            lambda v, img, mask: model.apply(
                v, img, mask, method=model.generate_coefficients
            )
        )

        # uint8 wire format for real serving: raw bytes over the
        # host->device tunnel (4x fewer than fp32), normalized in-program.
        _norm = _norm_u8

        is_curve = isinstance(model, CurlCurveNet)

        def _full(v, img_small, mask_small, target):
            # Whole deployment path in ONE program: a single dispatch (and a
            # single tunnel round-trip) per batch instead of one per stage;
            # the pallas path fuses the final composite into the kernel.
            img_small = _norm(img_small, scale=True)
            mask_small = _norm(mask_small, scale=False)
            target = _norm(target, scale=True)
            if is_curve:
                out, _ = model.apply(v, img_small, mask_small, target)
            else:
                r, l, h = model.apply(
                    v, img_small, mask_small, method=model.generate_coefficients
                )
                out = enhance.trispace_enhance(
                    target, r, l, h,
                    degree=model.polynomial_order,
                    spatial=model.spatial,
                    impl=impl,
                )
            if out_u8:
                # Same floor quantization as utils.imageio.save_image_u8 so
                # device-side u8 is byte-identical to host-side conversion;
                # the D2H fetch shrinks 4x.
                out = jnp.clip(out * 255.0, 0.0, 255.0).astype(jnp.uint8)
            return out

        # donate_target lets XLA reuse the (large) target buffer for the
        # output or temporaries — with a float target and float output the
        # shapes match exactly, so the serve program allocates no second
        # full-res buffer. Safe ONLY when every call hands over a fresh
        # buffer (host numpy feeds, as in enhance_stream serving); a caller
        # that reuses one device-resident target across calls must leave
        # this off (donated buffers are invalidated).
        donate = dict(donate_argnums=(3,)) if donate_target else {}
        self._full_fn = jax.jit(_full, **donate)

        def _full_probe(v, img_small, mask_small, target):
            # Serving-path variant: the backpressure probe (a scalar corner
            # of the output) is computed INSIDE the program, so the stream
            # pays ONE dispatch per batch instead of two (the separate
            # slice-program dispatch measurably costs throughput on the
            # tunneled platform — docs/ROOFLINE.md round 3).
            out = _full(v, img_small, mask_small, target)
            return out, out[0, 0, 0, 0]

        self._full_probe_fn = jax.jit(_full_probe)
        # Streaming serve function with the variables CLOSED OVER rather
        # than passed: flattening the ~300-leaf params pytree on every
        # dispatch costs real host time per batch (measured ~5 ms/batch on
        # a 1-core host — docs/ROOFLINE.md round 3); captured arrays are
        # flattened once at trace time.
        self._serve_fn = jax.jit(
            lambda img_small, mask_small, target: _full_probe(
                variables, img_small, mask_small, target
            ),
            **({"donate_argnums": (2,)} if donate_target else {}),
        )

        def _chained(img_small, mask_small, target):
            # K-chained serving program: inputs carry a leading chain axis
            # (K, B, ...); lax.scan executes the K batches SEQUENTIALLY in
            # ONE dispatched program, so the per-program turnaround that
            # bounds pipelined serving (measured 21.1 ms/batch completion vs
            # 17.25 ms chained device slope at 1080p batch 8 —
            # docs/ROOFLINE.md round 3) is paid once per K batches. The scan
            # body is compiled once; peak live memory is one batch's
            # intermediates plus the stacked in/outputs.
            def body(carry, xs):
                i, m, t = xs
                return carry, _full(variables, i, m, t)

            _, outs = jax.lax.scan(body, 0, (img_small, mask_small, target))
            return outs, outs[0, 0, 0, 0, 0]

        self._chained_fn = jax.jit(_chained)

    @property
    def variables(self):
        """The model variables (immutable: serving programs close over them)."""
        return self._variables

    def coefficients(self, img_small: Array, mask_small: Array):
        """(B, s, s, 3), (B, s, s, 1) -> (R, L, H) each (B, 3, N).
        Polynomial models only."""
        if isinstance(self.model, CurlCurveNet):
            raise NotImplementedError(
                "coefficients()/residual()/tile_rows are polynomial-model "
                "helpers; the curve model applies in one fused pass"
            )
        return self._coeff_fn(self.variables, img_small, mask_small)

    def residual(
        self,
        target: Array,
        coeffs,
        tile_rows: Optional[int] = None,
    ) -> Array:
        """Apply coefficients at target resolution, optionally in row bands."""
        r, l, h = coeffs
        b, height, width, _ = target.shape
        kw = dict(
            degree=self.model.polynomial_order,
            spatial=self.model.spatial,
            impl=self.impl,
        )
        if tile_rows is None or tile_rows >= height:
            return enhance.trispace_residual(target, r, l, h, **kw)
        bands = []
        for y0 in range(0, height, tile_rows):
            rows = min(tile_rows, height - y0)
            band = target[:, y0 : y0 + rows]
            if rows < tile_rows:
                band = jnp.pad(band, ((0, 0), (0, tile_rows - rows), (0, 0), (0, 0)))
            res = enhance.trispace_residual(
                band, r, l, h, tile=(y0, 0, height, width), **kw
            )
            bands.append(res[:, :rows])
        return jnp.concatenate(bands, axis=1)

    def enhance_chained(self, img_small: Array, mask_small: Array, target: Array):
        """K-chained serving: all arrays carry a leading chain axis
        (K, B, ...). ONE dispatched program runs the K batches sequentially
        (lax.scan), amortizing the per-program turnaround across K — the
        serving-gap closer for the tunneled platform (docs/ROOFLINE.md).
        Returns (outputs (K, B, H, W, C), probe scalar); host-fetch the
        probe to bound the dispatch queue, exactly like enhance_stream's
        in-program probe."""
        return self._chained_fn(img_small, mask_small, target)

    def enhance_stream(self, batches, max_in_flight: int = 6):
        """Pipelined batch enhancement: yields outputs in order while keeping
        at most `max_in_flight` dispatched programs queued on the device.

        `batches` yields (img_small, mask_small, target) triples (same-shape
        batches reuse one compiled program). On a tunneled TPU the dispatch
        round-trip (~31 ms) otherwise dominates: pipelining pays it once per
        window instead of once per batch (docs/ROOFLINE.md — 159 -> 305
        img/s at 1080p batch 8). Backpressure mechanics, measured on the
        tunneled platform (docs/ROOFLINE.md):
          * the depth bound is enforced by host-fetching a one-element
            probe, NOT block_until_ready, which returns before completion
            there and would leave the queue unbounded (the worker crashes
            under deep queues);
          * each probe is dispatched TOGETHER with its batch, so it sits
            directly behind it in the device's in-order queue — probing at
            dequeue time would queue behind every newer batch and
            serialize the pipeline;
          * one probe fetch completes every earlier batch too (in-order
            execution), so we sync once per half-window and yield the
            whole group, amortizing the fetch round-trip.

        Contract: the depth BOUND assumes single-stream in-order device
        execution (true on TPU and the single-threaded CPU backend, the
        targets here). On a hypothetical out-of-order backend outputs stay
        correct — consumers block on np.asarray of each result — but more
        than `max_in_flight` programs could be resident at once.

        The probe fetches run on a separate thread (the device client
        releases the GIL during the blocking fetch): the dispatching thread
        never sits out the ~31 ms fetch round-trip, which otherwise starves
        the device once per group (measured +20% throughput,
        docs/ROOFLINE.md round 3).
        """
        import queue as queue_mod
        import threading

        group = max(1, max_in_flight // 2)
        inflight: queue_mod.Queue = queue_mod.Queue()
        results: queue_mod.Queue = queue_mod.Queue()
        slots = threading.Semaphore(max_in_flight)

        def fetcher():
            pend = []

            def flush():
                try:
                    np.asarray(pend[-1][1])  # completes the whole group
                except Exception as e:  # surface device errors to consumer
                    # Fail-fast: a device error DISCARDS the whole in-flight
                    # group (its outputs may be poisoned); release the slots
                    # so the producer can't deadlock before seeing the error.
                    results.put(("error", e))
                    for _ in pend:
                        slots.release()
                    pend.clear()
                    return
                for o, _ in pend:
                    results.put(("ok", o))
                    slots.release()
                pend.clear()

            while True:
                item = inflight.get()
                if item is None:
                    if pend:
                        flush()
                    results.put(None)
                    return
                pend.append(item)
                if len(pend) >= group:
                    flush()

        thread = threading.Thread(target=fetcher, daemon=True)
        thread.start()

        def drain_ready(block: bool):
            while True:
                try:
                    r = results.get(block) if block else results.get_nowait()
                except queue_mod.Empty:
                    return
                if r is None:
                    return
                kind, payload = r
                if kind == "error":
                    raise payload
                yield payload

        try:
            for img_small, mask_small, target in batches:
                slots.acquire()
                # One dispatch per batch (probe is an extra program output,
                # not a separate slice program), with the variables closed
                # over so the per-dispatch Python cost is three leaves, not
                # ~300 (both measured — docs/ROOFLINE.md round 3).
                out, probe = self._serve_fn(img_small, mask_small, target)
                inflight.put((out, probe))
                yield from drain_ready(block=False)
            inflight.put(None)
            yield from drain_ready(block=True)
        finally:
            inflight.put(None)  # unblock the fetcher if the consumer bailed
            thread.join(timeout=60.0)

    def needs_banding(self, height: int, width: int) -> Optional[int]:
        """The single routing predicate for oversized images: the row-band
        height to stream a (height, width) image in, or None when a
        whole-image program fits the HBM heuristic. Curve models never band
        (one fused pass, far smaller memory profile than the polynomial
        residual). Both enhance_image and the directory-serving CLI route
        through here so the predicate cannot drift between them."""
        if isinstance(self.model, CurlCurveNet):
            return None
        rows = auto_tile_rows(height, width, self.auto_tile_pixels)
        if rows is not None and rows >= height:
            # Pathological aspect ratio (short + extremely wide): the image
            # exceeds the HBM heuristic but row-banding cannot shrink it
            # further. Fail LOUDLY instead of silently dispatching an
            # over-budget whole-image program (ADVICE r4): column banding is
            # unsupported (pallas lane tiling), so warn and run whole-image.
            warnings.warn(
                f"image {height}x{width} exceeds the per-program pixel budget "
                f"({self.auto_tile_pixels}) but is too short to row-band; "
                "dispatching a whole-image program — expect possible device "
                "instability on extreme widths",
                RuntimeWarning,
                stacklevel=3,
            )
            return None
        if rows is not None and rows * width > self.auto_tile_pixels:
            # Even the minimum 32-row band overshoots the budget (width >
            # budget_px/32): band anyway — each dispatched program is still
            # as small as this layout allows — but say so.
            warnings.warn(
                f"minimum 32-row band of width {width} exceeds the "
                f"per-program pixel budget ({self.auto_tile_pixels}); "
                "banding at the floor — expect possible device instability",
                RuntimeWarning,
                stacklevel=3,
            )
        return rows

    def enhance_image(
        self,
        img_small: Array,
        mask_small: Array,
        target: Array,
        target_mask: Optional[Array] = None,
        tile_rows: Optional[int] = None,
        white_background: bool = False,
    ) -> Array:
        """Full deployment path: coefficients from the small view, residual
        at target resolution, clamped composite; optional white-background
        matte like the mobile app (reference infer.py:44-47).

        `tile_rows=None` auto-selects: whole-image program when it fits the
        HBM heuristic, row bands otherwise (8K works with no flags —
        VERDICT r3 item 9). Pass an explicit value to force a band height.
        """
        if tile_rows is None:
            tile_rows = self.needs_banding(target.shape[1], target.shape[2])
        if tile_rows is None:
            out = self._full_fn(self.variables, img_small, mask_small, target)
        else:
            # The banded path runs in float (the fused u8 wire belongs to the
            # whole-image serving program); normalize u8 inputs here and
            # re-quantize at the end so both paths honor the same contract.
            img_small = _norm_u8(img_small, True)
            mask_small = _norm_u8(mask_small, False)
            target = _norm_u8(target, True)
            coeffs = self.coefficients(img_small, mask_small)
            residual = self.residual(target, coeffs, tile_rows=tile_rows)
            out = enhance.generate_image(target, residual)
            if self.out_u8:
                out = jnp.clip(out * 255.0, 0.0, 255.0).astype(jnp.uint8)
        if white_background and target_mask is not None:
            if out.dtype == jnp.uint8:
                m = target_mask.astype(jnp.float32)
                out = (out * m + (1.0 - m) * 255.0).astype(jnp.uint8)
            else:
                m = target_mask.astype(out.dtype)
                out = out * m + (1.0 - m)
        return out


def resize_shorter_side(img: np.ndarray, size: int) -> np.ndarray:
    """PIL bilinear resize of the shorter side to `size`, preserving aspect
    (torchvision Resize([size]) semantics, reference infer.py:32). Preserves
    dtype: uint8 in -> uint8 out (the serving wire format), float in ->
    float32 [0,1] out."""
    from PIL import Image

    h, w = img.shape[:2]
    if h <= w:
        nh, nw = size, max(1, round(w * size / h))
    else:
        nh, nw = max(1, round(h * size / w)), size
    was_u8 = img.dtype == np.uint8
    arr = img if was_u8 else np.clip(img * 255.0, 0, 255).astype(np.uint8)
    mode = "L" if arr.ndim == 2 else None
    out = Image.fromarray(arr.squeeze() if arr.ndim == 3 and arr.shape[2] == 1 else arr, mode)
    out = out.resize((nw, nh), Image.BILINEAR)
    res = np.asarray(out) if was_u8 else np.asarray(out, np.float32) / 255.0
    if img.ndim == 3 and res.ndim == 2:
        res = res[..., None]
    return res


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top, left = max(0, (h - size) // 2), max(0, (w - size) // 2)
    out = img[top : top + size, left : left + size]
    if out.shape[0] < size or out.shape[1] < size:
        pads = ((0, size - out.shape[0]), (0, size - out.shape[1])) + ((0, 0),) * (img.ndim - 2)
        out = np.pad(out, pads)
    return out
