"""PyTorch interop smoke test: LWM text checkpoints published in HF format
load as a standard LlamaForCausalLM (reference scripts/sample_pyt.py;
README.md:158-159)."""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--prompt", type=str, default="Question: What is the capital of France?\nAnswer:")
    parser.add_argument("--max_new_tokens", type=int, default=32)
    args = parser.parse_args()

    import torch
    from transformers import AutoTokenizer, LlamaForCausalLM

    tokenizer = AutoTokenizer.from_pretrained(args.model_path)
    model = LlamaForCausalLM.from_pretrained(
        args.model_path, torch_dtype=torch.float32, device_map="cpu"
    )
    inputs = tokenizer(args.prompt, return_tensors="pt")
    with torch.no_grad():
        out = model.generate(**inputs, max_new_tokens=args.max_new_tokens, do_sample=False)
    print(tokenizer.decode(out[0], skip_special_tokens=True))


if __name__ == "__main__":
    main()
