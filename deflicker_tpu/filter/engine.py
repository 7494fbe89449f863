"""Stage-2 engine: neural filter (U-Net) + sequential local refinement.

TPU-native redesign of `src/neural_filter_and_refinement.py:89-130`:

  * the U-Net filter is per-frame independent — we batch frames through it
    in chunks (the reference runs one frame per forward);
  * the refinement recurrence O_t = P_t + TransformNet(P_t, O_{t-1}, P_t,
    P_{t-1}) is a `lax.scan` over frames (one compile, state stays in HBM;
    the reference's Python loop crosses host<->device per frame);
  * frames are padded to /32 ('other' mode: width split, height
    all-bottom, replicate — src/models/utils.py:626-645); padded outputs
    map back to frame size by EXACT CROP by default — a deliberate
    deviation from the reference, which RESIZES the padded frame
    (neural_filter_and_refinement.py:111-121) and thereby squashes the
    image by up to 31 rows/cols.  The reference quirk stays available as
    unpad='resize' (byte-parity mode, tests/test_golden_e2e.py).

Output contract (identical to the reference):
  results/<vid>/neural_filter/concat/%05d.png   (content | atlas | filtered)
  results/<vid>/neural_filter/output/%05d.png   (filtered P_t)
  results/<vid>/final/output/%05d.png           (refined O_t)
  + the three .mp4s next to each folder.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..io.media import frames_to_video, list_frames, read_image, write_image
from ..models.refine import TransformNet
from ..models.unet import UNet
from ..ops.pad import Padder


@jax.jit
def _to_u8(x: jax.Array) -> jax.Array:
    """Device-side PNG quantization, bit-identical to write_image's host
    conversion ((clip(x,0,1)*255).astype(uint8) — truncating)."""
    return (jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("dtype", "mesh"))
def filter_frames(variables: Dict, content: jax.Array, style: jax.Array,
                  dtype=jnp.float32, mesh=None) -> jax.Array:
    """P = UNet(cat(content, atlas-frame)) on a batch of frames
    (neural_filter_and_refinement.py:97).

    With a mesh, the frame batch shards over the data axis (per-frame
    independent — pure data parallelism; params replicate, XLA SPMD splits
    every conv along the batch dim with no collectives in the forward).
    """
    from ..parallel import shard_constraint

    net = UNet(in_channels=6, out_channels=3, features=32, dtype=dtype)
    x = jnp.concatenate([content, style], axis=-1)
    if x.dtype == jnp.uint8:
        # frames ship to the device as uint8 (4x less H2D than f32 — the
        # transfer, not the convs, bounds stage 2 on PCIe/tunnel hosts)
        # and normalize to the [0,1] contract on device
        x = x.astype(dtype) / jnp.asarray(255.0, dtype)
    else:
        x = x.astype(dtype)
    x = shard_constraint(x, mesh)
    out = net.apply(variables, x).astype(jnp.float32)
    return shard_constraint(out, mesh)


@functools.partial(jax.jit, static_argnames=("dtype",))
def refine_sequence(variables: Dict, preds: jax.Array,
                    dtype=jnp.float32) -> jax.Array:
    """O_0 = P_0;  O_t = P_t + TransformNet(cat(P_t, O_{t-1}, P_t, P_{t-1}))
    (neural_filter_and_refinement.py:99-109) as a scan over frames.

    preds: (T, H, W, 3) filtered frames.  Returns (T, H, W, 3) refined.
    """
    net = TransformNet(nf=32, blocks=5, nc_out=3, dtype=dtype)

    def step(carry, p_t):
        o_prev, p_prev = carry
        inp = jnp.concatenate([p_t, o_prev, p_t, p_prev], axis=-1)[None]
        resid = net.apply(variables, inp.astype(dtype))[0].astype(jnp.float32)
        o_t = p_t + resid
        return (o_t, p_t), o_t

    p0 = preds[0]
    (_, _), rest = jax.lax.scan(step, (p0, p0), preds[1:])
    return jnp.concatenate([p0[None], rest], axis=0)


@functools.partial(jax.jit, static_argnames=("dtype",))
def refine_span(variables: Dict, carry, preds: jax.Array,
                n_valid: jax.Array, dtype=jnp.float32):
    """A SPAN of the refinement recurrence, carry threaded across calls.

    Streaming analog of `refine_sequence` (reference loop:
    src/neural_filter_and_refinement.py:99-109): the caller holds
    carry = (O_{t-1}, P_{t-1}) on device and feeds fixed-size spans of
    filtered frames, so HBM holds one span — not the whole video — and
    every span reuses ONE compiled program.  `n_valid` (traced scalar)
    marks how many frames of the span are real: the tail span is padded
    to the span length, and the carry freezes at the last real frame so
    padding never leaks into the recurrence.

    preds: (S, H, W, 3).  Returns (new_carry, refined (S, H, W, 3)).
    """
    net = TransformNet(nf=32, blocks=5, nc_out=3, dtype=dtype)

    def step(c, x):
        p_t, t = x
        o_prev, p_prev = c
        inp = jnp.concatenate([p_t, o_prev, p_t, p_prev], axis=-1)[None]
        resid = net.apply(variables, inp.astype(dtype))[0].astype(jnp.float32)
        o_t = p_t + resid
        keep = t < n_valid
        c = (jnp.where(keep, o_t, o_prev), jnp.where(keep, p_t, p_prev))
        return c, o_t

    ts = jnp.arange(preds.shape[0])
    carry, out = jax.lax.scan(step, carry, (preds, ts))
    return carry, out


@functools.partial(jax.jit, static_argnames=("dtype", "mesh"))
def refine_span_multi(variables: Dict, carry, preds: jax.Array,
                      n_valid: jax.Array, dtype=jnp.float32, mesh=None):
    """A SPAN of the multi-video refinement recurrence (streaming analog of
    `refine_sequence_multi`, the V-video generalization of `refine_span`).

    The V videos advance in lockstep — each scan step batches V frames
    through TransformNet — while the caller threads carry across spans so
    HBM holds one (V, S) window, never (V, T).  `n_valid` is PER VIDEO
    ((V,) int32): videos of differing length pad their tail spans, and each
    video's carry freezes independently at its last real frame, so padding
    never leaks into a shorter video's recurrence.

    preds: (V, S, H, W, 3).  Returns (new_carry, refined (V, S, H, W, 3)).
    """
    from ..parallel import shard_constraint

    net = TransformNet(nf=32, blocks=5, nc_out=3, dtype=dtype)

    def step(c, x):                            # p_t: (V, H, W, 3)
        p_t, t = x
        o_prev, p_prev = c
        inp = jnp.concatenate([p_t, o_prev, p_t, p_prev], axis=-1)
        inp = shard_constraint(inp, mesh)
        resid = net.apply(variables, inp.astype(dtype)).astype(jnp.float32)
        o_t = p_t + resid
        keep = (t < n_valid)[:, None, None, None]
        c = (jnp.where(keep, o_t, o_prev), jnp.where(keep, p_t, p_prev))
        return c, o_t

    seq = jnp.swapaxes(preds, 0, 1)            # (S, V, H, W, 3)
    ts = jnp.arange(seq.shape[0])
    carry, out = jax.lax.scan(step, carry, (seq, ts))
    return carry, jnp.swapaxes(out, 0, 1)


@functools.partial(jax.jit, static_argnames=("dtype", "mesh"))
def refine_sequence_multi(variables: Dict, preds: jax.Array,
                          dtype=jnp.float32, mesh=None) -> jax.Array:
    """Multi-video refinement: same recurrence, V videos advance in
    lockstep — the scan stays sequential in t (inherent data dependence on
    O_{t-1}) but each step batches V frames through TransformNet instead
    of one, and the V axis shards over the mesh (videos independent).

    preds: (V, T, H, W, 3) -> (V, T, H, W, 3).
    """
    from ..parallel import shard_constraint

    net = TransformNet(nf=32, blocks=5, nc_out=3, dtype=dtype)

    def step(carry, p_t):                      # p_t: (V, H, W, 3)
        o_prev, p_prev = carry
        inp = jnp.concatenate([p_t, o_prev, p_t, p_prev], axis=-1)
        inp = shard_constraint(inp, mesh)
        resid = net.apply(variables, inp.astype(dtype)).astype(jnp.float32)
        o_t = p_t + resid
        return (o_t, p_t), o_t

    p0 = preds[:, 0]
    seq = jnp.swapaxes(preds[:, 1:], 0, 1)     # (T-1, V, H, W, 3)
    (_, _), rest = jax.lax.scan(step, (p0, p0), seq)
    return jnp.concatenate([p0[:, None], jnp.swapaxes(rest, 0, 1)], axis=1)


class FilterEngine:
    def __init__(self, filter_variables: Dict, local_variables: Dict,
                 dtype=jnp.float32, batch: int = 16, mesh=None,
                 span: int = 32, unpad: str = "crop"):
        # batch 16 is the measured UNet throughput knee at production
        # 448x768 bf16 (BENCH_E2E stage2_ab filter_fps_by_batch:
        # 102.0 f/s at 8 -> 123.5 at 16 -> 119.1 at 32)
        self.filter_variables = filter_variables
        self.local_variables = local_variables
        self.dtype = dtype
        self.batch = batch
        self.mesh = mesh
        # How the padded (Hp, Wp) network outputs map back to (H, W) PNGs:
        #   "crop"   — slice off the replicate padding (geometrically exact;
        #              the default, and a deliberate DEVIATION from the
        #              reference, which cv2.resize()s the padded frame to
        #              org_size and thereby SQUASHES the image by up to
        #              31 rows/cols (neural_filter_and_refinement.py:111-121
        #              never calls InputPadder.unpad).  On a 90-row video
        #              that misalignment costs ~10 dB of final fidelity —
        #              measured in BENCH_E2E.json gt_diag.)
        #   "resize" — the reference's unpad-by-resize quirk, byte-parity
        #              with its outputs (tests/test_golden_e2e.py uses it).
        if unpad not in ("crop", "resize"):
            raise ValueError(f"unpad must be 'crop' or 'resize', got {unpad!r}")
        self.unpad = unpad
        # streaming span: frames resident on device/host per refinement call
        # (a 1080p padded span of 32 is ~0.8 GB of preds in HBM)
        self.span = max(2, span)
        if mesh is not None and batch % mesh.size != 0:
            # keep the sharded frame batch even across devices
            self.batch = ((batch + mesh.size - 1) // mesh.size) * mesh.size

    @staticmethod
    def _read_u8(path):
        from PIL import Image

        img = np.array(Image.open(str(path)))
        if img.ndim == 2:
            img = np.tile(img[:, :, None], (1, 1, 3))
        return np.ascontiguousarray(img[..., :3])

    @classmethod
    def _load_span(cls, content_names, style_names, s0, s1, H, W):
        """Load frames [s0, s1) as uint8 (PNGs are uint8 on disk; keeping
        them so until the on-device /255 makes H2D 4x smaller).  Style is
        resized to the content's size like the reference — which also
        resizes the uint8 image before normalizing
        (load_image(size=org_size), models/utils.py:600-624)."""
        import cv2

        n = s1 - s0
        content = np.zeros((n, H, W, 3), np.uint8)
        style = np.zeros((n, H, W, 3), np.uint8)
        for t in range(n):
            content[t] = cls._read_u8(content_names[s0 + t])
            s = cls._read_u8(style_names[s0 + t])
            if s.shape[:2] != (H, W):
                s = cv2.resize(s, (W, H), interpolation=cv2.INTER_LINEAR)
            style[t] = s
        return content, style

    def _filter_all(self, content: np.ndarray, style: np.ndarray,
                    padder: Padder) -> jax.Array:
        """Batched UNet filtering of all frames; returns a DEVICE-resident
        (T, Hp, Wp, 3) f32 array (the refinement consumes it on device —
        bouncing preds through the host would cost a D2H+H2D round trip
        of the whole span).

        T is padded to a batch multiple (repeat the last frame) so every
        chunk — including the tail — has the same shape: exactly ONE XLA
        compile (each stray shape costs a full recompile; minutes through
        this environment's remote compile server)."""
        T = content.shape[0]
        T_pad = ((T + self.batch - 1) // self.batch) * self.batch
        if T_pad != T:
            content = np.concatenate(
                [content, np.repeat(content[-1:], T_pad - T, axis=0)], axis=0)
            style = np.concatenate(
                [style, np.repeat(style[-1:], T_pad - T, axis=0)], axis=0)
        content_p = padder.pad(jnp.asarray(content))
        style_p = padder.pad(jnp.asarray(style))
        preds = [filter_frames(self.filter_variables, content_p[s0:s0 + self.batch],
                               style_p[s0:s0 + self.batch],
                               dtype=self.dtype, mesh=self.mesh)
                 for s0 in range(0, T_pad, self.batch)]
        out = preds[0] if len(preds) == 1 else jnp.concatenate(preds, axis=0)
        return out[:T]

    def _write_span(self, s0, content, style, preds, refined, results_dir,
                    save_concat, size, padder):
        """PNG writes for one span (runs on the writer thread — pure
        cv2/numpy, no JAX).  Padded (Hp, Wp) preds map back to (H, W) by
        self.unpad: exact crop (default) or the reference's resize quirk."""
        import cv2

        W, H = size
        results_dir = Path(results_dir)
        concat_dir = results_dir / "neural_filter" / "concat"
        filter_dir = results_dir / "neural_filter" / "output"
        final_dir = results_dir / "final" / "output"
        if self.unpad == "crop":
            hp, wp = preds.shape[1:3]
            preds = preds[:, padder.top:hp - padder.bottom,
                          padder.left:wp - padder.right]
            refined = refined[:, padder.top:hp - padder.bottom,
                              padder.left:wp - padder.right]
        for t in range(preds.shape[0]):
            if self.unpad == "crop":
                p, o = preds[t], refined[t]
            else:
                p = cv2.resize(preds[t], (W, H),
                               interpolation=cv2.INTER_LINEAR)
                o = cv2.resize(refined[t], (W, H),
                               interpolation=cv2.INTER_LINEAR)
            write_image(p, filter_dir / f"{s0 + t:05d}.png")
            write_image(o, final_dir / f"{s0 + t:05d}.png")
            if save_concat:
                write_image(np.concatenate([content[t], style[t], p], axis=1),
                            concat_dir / f"{s0 + t:05d}.png")

    def run(self, content_dir: str | Path, style_dir: str | Path,
            results_dir: str | Path, fps: int = 10,
            save_concat: bool = True,
            return_output: bool = True) -> Optional[np.ndarray]:
        """Full stage 2 over a video's frames — STREAMING.

        Three overlapped stages (the reference — and our round-2 engine —
        serialized load-all -> compute-all -> write-all,
        src/neural_filter_and_refinement.py:89-121):

          reader thread:  PNG decode of span k+1
          main thread:    UNet filter (batched) + refinement span k
                          (carry threaded on device, see refine_span)
          writer thread:  PNG encode of span k-1

        Peak memory is a few spans, not the video: a 200-frame 1080p clip
        that could not fit HBM/host RAM as one (T, Hp, Wp, 3) tensor now
        streams through in `span`-frame windows, and PNG encode rides
        behind device compute instead of after it.

        Returns refined (T, Hp, Wp, 3) when `return_output` (tests /
        small runs); pass False for long videos to skip accumulation.
        """
        from concurrent.futures import ThreadPoolExecutor

        content_names = list_frames(content_dir)
        style_names = list_frames(style_dir)
        assert len(content_names) == len(style_names), (
            f"{len(content_names)} content vs {len(style_names)} style frames")
        T = len(content_names)
        H, W = read_image(content_names[0]).shape[:2]
        padder = Padder(H, W, divisor=32, mode="other")
        S = self.span
        results_dir = Path(results_dir)

        spans = [(s0, min(T, s0 + S)) for s0 in range(0, T, S)]
        reader = ThreadPoolExecutor(max_workers=1)
        writer = ThreadPoolExecutor(max_workers=1)
        pending = []
        outputs = [] if return_output else None
        try:
            nxt = reader.submit(self._load_span, content_names, style_names,
                                *spans[0], H, W)
            carry = None
            for k, (s0, s1) in enumerate(spans):
                content, style = nxt.result()
                if k + 1 < len(spans):
                    nxt = reader.submit(self._load_span, content_names,
                                        style_names, *spans[k + 1], H, W)
                preds = self._filter_all(content, style, padder)   # device
                if carry is None:
                    # O_0 = P_0; the recurrence starts at frame 1 with
                    # carry (P_0, P_0) (neural_filter_and_refinement.py:99)
                    p0 = preds[0]
                    carry = (p0, p0)
                    body, offset = preds[1:], 1
                else:
                    body, offset = preds, 0
                nb = int(body.shape[0])
                if nb:
                    # pad to the span length: ONE compiled refine program
                    # for every span including the tail
                    body_p = (body if nb == S else jnp.concatenate(
                        [body, jnp.repeat(body[-1:], S - nb, axis=0)]))
                    carry, out = refine_span(
                        self.local_variables, carry, body_p,
                        jnp.int32(nb), dtype=self.dtype)
                    refined = out[:nb]
                else:
                    refined = body
                if offset:
                    refined = jnp.concatenate([preds[:1], refined], axis=0)
                # D2H as uint8 — write_image's exact clip*255 truncation,
                # applied on device: 4x less transfer than f32 frames
                preds_u8 = np.asarray(_to_u8(preds))
                refined_u8 = np.asarray(_to_u8(refined))
                # bound writer backlog to ~2 spans of frames in flight
                while len(pending) > 2:
                    pending.pop(0).result()
                pending.append(writer.submit(
                    self._write_span, s0, content, style, preds_u8,
                    refined_u8, results_dir, save_concat, (W, H), padder))
                if return_output:
                    outputs.append(np.asarray(refined))
            for f in pending:
                f.result()
        finally:
            reader.shutdown(wait=False)
            writer.shutdown(wait=True)

        dirs = ([results_dir / "neural_filter" / "concat"] if save_concat
                else [])
        dirs += [results_dir / "neural_filter" / "output",
                 results_dir / "final" / "output"]
        for d in dirs:
            frames_to_video(d, d.parent / (d.name + ".mp4"), fps=fps)
        return np.concatenate(outputs, axis=0) if return_output else None

    def run_multi(self, jobs, fps: int = 10, save_concat: bool = True,
                  return_output: bool = True):
        """Stage 2 over several same-resolution videos — STREAMING lockstep.

        Same three overlapped stages as `run` (reader thread / device
        compute / writer thread), with the V videos advancing through the
        refinement recurrence in lockstep spans (`refine_span_multi`):
        UNet filtering batches V·span frames per dispatch, and each scan
        step pushes V frames through TransformNet instead of one.  Host
        RAM and HBM hold a few (V, span) windows, never a whole video —
        the round-2 design loaded every video f32 on host and stacked the
        full (V, T, Hp, Wp, 3) tensor in HBM, the exact OOM hazard `run`
        fixed for the single-video path.

        jobs: list of (content_dir, style_dir, results_dir).  Videos of
        differing length idle on their last frame once ended; each video's
        recurrence carry freezes independently (n_valid in
        refine_span_multi), so padding never leaks into real frames.
        Pass return_output=False for long videos (cli.batch does) to skip
        host-side accumulation of the refined frames.
        """
        from concurrent.futures import ThreadPoolExecutor

        metas = []
        for c, s, r in jobs:
            cn, sn = list_frames(c), list_frames(s)
            assert len(cn) == len(sn), (
                f"{len(cn)} content vs {len(sn)} style frames ({c})")
            metas.append((cn, sn, Path(r)))
        V = len(metas)
        Ts = [len(cn) for cn, _, _ in metas]
        shapes = {read_image(cn[0]).shape[:2] for cn, _, _ in metas}
        if len(shapes) != 1:
            raise ValueError(f"run_multi needs same-resolution videos, "
                             f"got {shapes} (group by shape first)")
        H, W = shapes.pop()
        padder = Padder(H, W, divisor=32, mode="other")
        S = self.span
        T_max = max(Ts)
        spans = [(s0, min(T_max, s0 + S)) for s0 in range(0, T_max, S)]
        mesh = (self.mesh if self.mesh is not None
                and V % self.mesh.size == 0 else None)

        def load_span(s0, s1):
            import cv2

            n = s1 - s0
            content = np.zeros((V, n, H, W, 3), np.uint8)
            style = np.zeros((V, n, H, W, 3), np.uint8)
            for v, (cn, sn, _) in enumerate(metas):
                for j in range(n):
                    # ended videos idle on their last frame (frozen carry
                    # makes the computed output for them dead anyway)
                    t = min(s0 + j, Ts[v] - 1)
                    content[v, j] = self._read_u8(cn[t])
                    si = self._read_u8(sn[t])
                    if si.shape[:2] != (H, W):
                        si = cv2.resize(si, (W, H),
                                        interpolation=cv2.INTER_LINEAR)
                    style[v, j] = si
            return content, style

        reader = ThreadPoolExecutor(max_workers=1)
        writer = ThreadPoolExecutor(max_workers=1)
        pending = []
        outputs = [[] for _ in range(V)] if return_output else None
        try:
            nxt = reader.submit(load_span, *spans[0])
            carry = None
            for k, (s0, s1) in enumerate(spans):
                content, style = nxt.result()
                if k + 1 < len(spans):
                    nxt = reader.submit(load_span, *spans[k + 1])
                n = s1 - s0
                flat = self._filter_all(content.reshape(V * n, H, W, 3),
                                        style.reshape(V * n, H, W, 3),
                                        padder)
                preds = flat.reshape(V, n, *flat.shape[1:])
                if carry is None:
                    p0 = preds[:, 0]           # O_0 = P_0 per video
                    carry = (p0, p0)
                    body, offset = preds[:, 1:], 1
                else:
                    body, offset = preds, 0
                nb = int(body.shape[1])
                if nb:
                    body_p = (body if nb == S else jnp.concatenate(
                        [body, jnp.repeat(body[:, -1:], S - nb, axis=1)],
                        axis=1))
                    # clip per-video validity to the REAL body frames of
                    # this span (nb, not S): tail-padding frames must never
                    # advance any video's carry, even one whose own frames
                    # continue into the next span
                    nv = np.clip(np.asarray(Ts) - (s0 + offset), 0,
                                 nb).astype(np.int32)
                    carry, out = refine_span_multi(
                        self.local_variables, carry, body_p,
                        jnp.asarray(nv), dtype=self.dtype, mesh=mesh)
                    refined = out[:, :nb]
                else:
                    refined = body
                if offset:
                    refined = jnp.concatenate([preds[:, :1], refined],
                                              axis=1)
                preds_u8 = np.asarray(_to_u8(preds))
                refined_u8 = np.asarray(_to_u8(refined))
                while len(pending) > 2 * V:
                    pending.pop(0).result()
                for v, (_, _, rdir) in enumerate(metas):
                    nreal = min(Ts[v], s1) - s0
                    if nreal <= 0:
                        continue                # this video already ended
                    pending.append(writer.submit(
                        self._write_span, s0, content[v, :nreal],
                        style[v, :nreal], preds_u8[v, :nreal],
                        refined_u8[v, :nreal], rdir, save_concat, (W, H),
                        padder))
                    if return_output:
                        outputs[v].append(np.asarray(refined[v, :nreal]))
            for f in pending:
                f.result()
        finally:
            reader.shutdown(wait=False)
            writer.shutdown(wait=True)

        out = []
        for v, (_, _, rdir) in enumerate(metas):
            dirs = ([rdir / "neural_filter" / "concat"] if save_concat
                    else [])
            dirs += [rdir / "neural_filter" / "output",
                     rdir / "final" / "output"]
            for d in dirs:
                frames_to_video(d, d.parent / (d.name + ".mp4"), fps=fps)
            if return_output:
                out.append(np.concatenate(outputs[v], axis=0))
        return out if return_output else None


def _resolve_ckpt(path: Optional[str | Path]) -> Optional[Path]:
    """The checkpoint to load, in order: the given path; its
    in-framework-trained `.ckpt` sibling (cli.train_stage2 writes
    `neural_filter.ckpt` next to where the reference's `neural_filter.pth`
    would live); the framework's SHIPPED weights of the same name
    (<repo>/pretrained_weights — so running the pipeline from any cwd with
    the default relative paths still finds real weights); else None."""
    if not path:
        return None
    path = Path(path)
    if path.exists():
        return path
    trained = path.with_suffix(".ckpt")
    if trained.exists():
        return trained
    shipped = (Path(__file__).resolve().parents[2] / "pretrained_weights"
               / trained.name)
    return shipped if shipped.exists() else None


def load_filter_engine(ckpt_filter: Optional[str | Path],
                       ckpt_local: Optional[str | Path],
                       dtype=jnp.float32, batch: int = 16,
                       seed: int = 2023, mesh=None,
                       unpad: str = "crop") -> FilterEngine:
    """Build a FilterEngine from checkpoints.  A missing `.pth` falls back
    to an in-framework-trained `.ckpt` sibling (cli.train_stage2), then to
    seeded random init (smoke runs only — results are not meaningful, but
    the pipeline exercises)."""
    from ..models.refine import transformnet_init
    from ..models.unet import unet_init
    from .convert import load_stage2_checkpoint

    fpath = _resolve_ckpt(ckpt_filter)
    lpath = _resolve_ckpt(ckpt_local)
    if fpath is None or lpath is None:
        # same loud-fallback pattern as the RAFT->Farneback notice
        # (flow/engine.py): random stage-2 weights are smoke-test only
        print("[deflicker_tpu] stage-2 checkpoint(s) missing "
              f"({ckpt_filter} / {ckpt_local}) — using RANDOM weights "
              "(smoke only; train real ones with cli.train_stage2)")
    fvars = (load_stage2_checkpoint(fpath) if fpath
             else unet_init(jax.random.key(seed)))
    lvars = (load_stage2_checkpoint(lpath) if lpath
             else transformnet_init(jax.random.key(seed + 1)))
    return FilterEngine(fvars, lvars, dtype=dtype, batch=batch, mesh=mesh,
                        unpad=unpad)
