"""Warm serving API: load the networks once, deflicker many videos.

The reference is a chain of one-shot OS processes (test.py ->
os.system(...) — SURVEY.md §1): every video re-reads every checkpoint and
recompiles everything.  For production serving the framework keeps all
state warm in one process:

    from deflicker_tpu import Deflickerer

    d = Deflickerer()                       # checkpoints load once
    out_a = d.process("a.mp4")              # first call compiles
    out_b = d.process("b.mp4")              # same-shape clips: weights,
                                            # jit caches, mesh all reused

RAFT / UNet / TransformNet weights load exactly once; XLA executables are
reused in-process via jit caches (and across processes via the persistent
compile cache the package enables).  A mesh is picked up automatically
when more than one device is visible — same policy as the CLI.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional

from .config import AtlasConfig, PipelineConfig, load_atlas_config


class Deflickerer:
    """Reusable deflickering service handle (see module docstring)."""

    def __init__(self,
                 ckpt_raft: str = "./pretrained_weights/raft-things.pth",
                 ckpt_filter: str = "./pretrained_weights/neural_filter.pth",
                 ckpt_local: str =
                 "./pretrained_weights/local_refinement_net.pth",
                 config: str = "config_flow_100.json",
                 root: str = "data/test/",
                 results_root: str = "results",
                 stage2_dtype: str = "bfloat16",
                 stage2_unpad: str = "crop",
                 mesh: object = "auto"):
        self.ckpt_raft = ckpt_raft
        self.ckpt_filter = ckpt_filter
        self.ckpt_local = ckpt_local
        self.root = root
        self.results_root = results_root
        self.stage2_dtype = stage2_dtype
        self.stage2_unpad = stage2_unpad
        cfg_path = Path(config)
        self.atlas_cfg = (load_atlas_config(cfg_path) if cfg_path.exists()
                          else AtlasConfig())
        if mesh == "auto":
            import jax

            mesh = None
            if len(jax.devices()) > 1:
                from .parallel import make_mesh

                mesh = make_mesh()
        self.mesh = mesh
        self._flow_provider = None
        self._filter_engine = None

    # -- lazy, load-once network state -------------------------------------
    @property
    def flow_provider(self):
        if self._flow_provider is None:
            from .cli.pipeline import make_flow_provider

            self._flow_provider = make_flow_provider(
                self._pipe_cfg(video_name="_"), mesh=self.mesh)
        return self._flow_provider

    @property
    def filter_engine(self):
        if self._filter_engine is None:
            import jax.numpy as jnp

            from .filter import load_filter_engine

            self._filter_engine = load_filter_engine(
                self.ckpt_filter, self.ckpt_local, mesh=self.mesh,
                dtype=jnp.dtype(self.stage2_dtype),
                unpad=self.stage2_unpad)
        return self._filter_engine

    def _pipe_cfg(self, **overrides) -> PipelineConfig:
        base = dict(ckpt_raft=self.ckpt_raft, ckpt_filter=self.ckpt_filter,
                    ckpt_local=self.ckpt_local, root=self.root,
                    results_root=self.results_root,
                    stage2_dtype=self.stage2_dtype,
                    stage2_unpad=self.stage2_unpad)
        base.update(overrides)
        return PipelineConfig(**base)

    def process(self, video: Optional[str] = None,
                frame_folder: Optional[str] = None,
                class_name: Optional[str] = None,
                down: Optional[int] = None,
                fps: int = 10,
                iters: Optional[int] = None,
                seed: Optional[int] = None) -> Dict:
        """Run the full pipeline on one video; returns the metrics dict
        (same contract as cli.pipeline.run_pipeline).  Checkpoints and jit
        caches persist across calls."""
        from .cli.pipeline import run_pipeline

        cfg = self._pipe_cfg(video_name=video,
                             video_frame_folder=frame_folder,
                             class_name=class_name, down=down, fps=fps)
        atlas_cfg = self.atlas_cfg
        overrides = {}
        if iters is not None:
            overrides = {"iters_num": iters,
                         "evaluate_every": max(1, iters - 1)}
        if seed is not None:
            overrides["seed"] = seed
        if overrides:
            atlas_cfg = dataclasses.replace(atlas_cfg, **overrides)
        return run_pipeline(cfg, atlas_cfg, mesh=self.mesh,
                            flow_provider=self.flow_provider,
                            filter_engine=self.filter_engine)
