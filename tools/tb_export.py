"""Convert a MetricLogger scalars JSONL file into TensorBoard event files.

Runs recorded before the native TB writer existed (or with
``MetricLogger(tensorboard=False)``) can be loaded into
``tensorboard --logdir`` retroactively:

  python tools/tb_export.py work_dirs/upn_tiny/train.scalars.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dat_segmentation_tpu.utils.tensorboard import SummaryWriter  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scalars", help="path to *.scalars.jsonl")
    ap.add_argument("--out", default=None,
                    help="TB logdir (default: <run dir>/tb)")
    args = ap.parse_args()

    src = Path(args.scalars)
    out = Path(args.out) if args.out else src.parent / "tb"
    w = SummaryWriter(out)
    n = 0
    for line in src.read_text().splitlines():
        if not line.strip():
            continue
        rec = json.loads(line)
        step = int(rec.pop("step", 0))
        rec.pop("time", None)
        vals = {k: v for k, v in rec.items() if isinstance(v, (int, float))}
        if vals:
            w.add_scalars_dict(vals, step)
            n += 1
    w.close()
    print(f"wrote {n} events to {out}")


if __name__ == "__main__":
    main()
