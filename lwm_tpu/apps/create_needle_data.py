"""Dump a HF text dataset (default pg19) to JSONL {"text": ...} lines for
the needle evals (reference scripts/create_needle_data.py)."""

import argparse
import json
import os

from tqdm import tqdm


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_path", type=str, default="data/pg19.jsonl")
    parser.add_argument("--dataset", type=str, default="pg19")
    parser.add_argument("--split", type=str, default="train")
    args = parser.parse_args()

    os.makedirs(os.path.dirname(args.output_path) or ".", exist_ok=True)
    from datasets import load_dataset

    dset = load_dataset(args.dataset)[args.split]
    with open(args.output_path, "w") as f:
        for elem in tqdm(dset):
            f.write(json.dumps({"text": elem["text"]}) + "\n")


if __name__ == "__main__":
    main()
