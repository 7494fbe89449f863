#!/usr/bin/env python
"""test.py-compatible entry point for the TPU-native deflicker pipeline.

    python run_deflicker.py --video_name data/test/X.mp4 [--class_name Y]
                            [--fps 10] [--down 4] [--iters 10000]

Same public flags as the reference's test.py (reference: test.py:4-11), plus
TPU extensions — see `python run_deflicker.py --help`.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from deflicker_tpu.cli.main import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
