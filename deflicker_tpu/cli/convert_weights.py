"""Checkpoint conversion CLI: torch .pth -> pickled flax variables.

    python -m deflicker_tpu.cli.convert_weights --kind raft \
        --src pretrained_weights/raft-things.pth --dst raft-things.ckpt

Conversion also happens transparently when the pipeline is pointed at a
.pth file; this CLI just lets you do it once and ship the converted file
(loading it needs no torch).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="torch -> flax weight conversion")
    p.add_argument("--kind", required=True,
                   choices=["raft", "filter", "local"],
                   help="raft-things / neural_filter / local_refinement_net")
    p.add_argument("--src", required=True, type=str, help="torch .pth path")
    p.add_argument("--dst", required=True, type=str,
                   help="output path (pickled variables)")
    args = p.parse_args(argv)

    from ..utils.checkpoint import save_checkpoint

    if args.kind == "raft":
        from ..flow.convert import load_raft_checkpoint

        variables = load_raft_checkpoint(args.src)
    else:
        from ..filter.convert import load_stage2_checkpoint

        variables = load_stage2_checkpoint(args.src)
    save_checkpoint(args.dst, variables)
    n = sum(x.size for x in
            __import__("jax").tree_util.tree_leaves(variables))
    print(f"{args.kind}: {n:,} parameters -> {Path(args.dst).resolve()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
