"""Generate the v1-format golden checkpoint fixture.

The released LWM checkpoints are v1 streams — a bare msgpack sequence of
``(path_tuple, flax.serialization.to_bytes(leaf))`` tuple records (the
tux/EasyLM ``StreamingCheckpointer`` wire format; reference train.py:337-344
consumes them via ``params::PATH`` specs). This writer intentionally does
NOT go through lwm_tpu.checkpoint: it reproduces the external format from
first principles so tests/test_7b_contracts.py locks our READER against the
released layout, independent of our own writer's evolution.

Run from the repo root to (re)generate:
    python tests/fixtures/make_v1_golden.py
The fixture is committed; regeneration must be byte-identical (seeded).
"""

import os
import sys

import msgpack
import numpy as np
from flax.serialization import to_bytes

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# Tiny-but-real LLaMA param tree: every param family of the released 7B
# tree (wte, per-layer wq/wk/wv/wo, w1/w2/w3, both norms, ln_f, lm_head)
# at debug scale, UNSCANNED layout (layers as numbered children — the
# released checkpoints' tree shape).
VOCAB, HIDDEN, INTER, LAYERS = 128, 32, 64, 2


def make_params():
    rng = np.random.RandomState(20260818)

    def w(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    params = {
        "transformer": {
            "wte": {"embedding": w(VOCAB, HIDDEN)},
            "ln_f": {"kernel": np.ones(HIDDEN, np.float32)},
            "h": {},
        },
        "lm_head": {"kernel": w(HIDDEN, VOCAB)},
    }
    for i in range(LAYERS):
        params["transformer"]["h"][str(i)] = {
            "attention": {
                "wq": {"kernel": w(HIDDEN, HIDDEN)},
                "wk": {"kernel": w(HIDDEN, HIDDEN)},
                "wv": {"kernel": w(HIDDEN, HIDDEN)},
                "wo": {"kernel": w(HIDDEN, HIDDEN)},
            },
            "feed_forward": {
                "w1": {"kernel": w(HIDDEN, INTER)},
                "w2": {"kernel": w(INTER, HIDDEN)},
                "w3": {"kernel": w(HIDDEN, INTER)},
            },
            "attention_norm": {"kernel": np.ones(HIDDEN, np.float32)},
            "ffn_norm": {"kernel": np.ones(HIDDEN, np.float32)},
        }
    return params


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def main():
    out_path = os.path.join(os.path.dirname(__file__), "v1_golden_params.ckpt")
    packer = msgpack.Packer()
    with open(out_path, "wb") as fout:
        # deterministic record order (the released writer streams in tree
        # order; any order must load — sorted keys make the fixture stable)
        for key, value in sorted(flatten(make_params()).items()):
            fout.write(packer.pack((key, to_bytes(value))))
    print(f"wrote {out_path} ({os.path.getsize(out_path)} bytes)")


if __name__ == "__main__":
    main()
