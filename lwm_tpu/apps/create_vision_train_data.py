"""Generate a synthetic text→frame-token dataset that validates the vision
stack end-to-end with a LEARNABLE mapping (the vision analogue of the
needle pipeline): each example is a text prompt naming one of
--n_patterns classes and a single 256-code frame whose codes are a fixed
deterministic function of the class, so a trained model must route
text → vte/dual-head → CFG sampler correctly to reproduce the frame.

Frame construction for class c: code[i] = (c * stride + i * step) % n_codes
— position-dependent, so getting a frame right requires per-position
prediction, not a constant.

Output lines follow the JsonVisionDataset contract
(`{"fields": "text,vision", "text": ..., "vision": [256 ints]}` with
`fields_from_example='fields'`); reference data.py:545-842 semantics.

Usage:
  python -m lwm_tpu.apps.create_vision_train_data \
      --n_train 4000 --output /tmp/vision/train.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import random

_NAMES = (
    "zero one two three four five six seven eight nine ten eleven twelve "
    "thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
).split()

PROMPT_TEMPLATE = "draw pattern {name} now"


def pattern_frame(cls, n_codes=8192, n_per_frame=256, stride=997, step=13):
    return [(cls * stride + i * step) % n_codes for i in range(n_per_frame)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_train", type=int, default=4000)
    p.add_argument("--n_patterns", type=int, default=12)
    p.add_argument("--n_codes", type=int, default=8192)
    p.add_argument("--n_per_frame", type=int, default=256)
    p.add_argument("--seed", type=int, default=5)
    p.add_argument("--output", type=str, required=True)
    args = p.parse_args()
    assert args.n_patterns <= len(_NAMES)

    rng = random.Random(args.seed)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w") as f:
        for _ in range(args.n_train):
            cls = rng.randrange(args.n_patterns)
            f.write(
                json.dumps(
                    {
                        "fields": "[text],vision",
                        "text": PROMPT_TEMPLATE.format(name=_NAMES[cls]),
                        "vision": pattern_frame(
                            cls, args.n_codes, args.n_per_frame
                        ),
                    }
                )
                + "\n"
            )
    print(f"wrote {args.n_train} pattern examples "
          f"({args.n_patterns} classes) to {args.output}")


if __name__ == "__main__":
    main()
