"""Train a small VQ image tokenizer on real images (beyond-reference).

The reference ships its VQGAN inference-only (reference vqgan.py) and
relies on the released pickle; offline, nothing validates a REAL-image
tokenize→detokenize round trip. This trainer closes that gap at small
scale: a VQ-VAE objective (no GAN/perceptual terms — reconstruction
quality, not sample sharpness, is what the tokenizer contract needs)
over random crops of any directory of images, saving params as the SAME
pickle layout the released artifact uses, so the `VQGAN` wrapper loads
the result through the exact released-checkpoint path.

Objective: ‖x − x̂‖² + ‖sg(z) − e‖² + β·‖z − sg(e)‖²  (VQ-VAE; van den
Oord et al., 2017), with dead-code revival (codes unused for
`revive_every` steps re-seeded to random encoder outputs — small
codebooks otherwise collapse to a few codes).

Run:
  python -m lwm_tpu.apps.train_vqgan --image_dir=... --output=params.pkl \
      --resolution=64 --steps=2000
Then evaluate the round trip:
  held-out crops → encode → decode; reports PSNR and codebook usage.
"""

import argparse
import glob
import os
import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lwm_tpu.models.vqgan import VQGANConfig, VQGANModel


def load_images(image_dir, resolution):
    from PIL import Image

    paths = sorted(
        p for ext in ("png", "jpg", "jpeg", "bmp", "webp")
        for p in glob.glob(os.path.join(image_dir, f"*.{ext}"))
    )
    if not paths:
        raise FileNotFoundError(f"no images under {image_dir}")
    imgs = []
    for p in paths:
        im = Image.open(p).convert("RGB")
        if min(im.size) < resolution:
            scale = resolution / min(im.size)
            im = im.resize(
                (int(im.width * scale + 1), int(im.height * scale + 1))
            )
        imgs.append(np.asarray(im, np.float32) / 127.5 - 1.0)  # [-1, 1]
    return imgs


def crop_batch(imgs, rng, batch, resolution):
    out = np.empty((batch, resolution, resolution, 3), np.float32)
    for i in range(batch):
        im = imgs[rng.randint(len(imgs))]
        y = rng.randint(im.shape[0] - resolution + 1)
        x = rng.randint(im.shape[1] - resolution + 1)
        out[i] = im[y : y + resolution, x : x + resolution]
    return out


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))  # inputs in [-1, 1] → peak 2.0
    return 10.0 * np.log10(4.0 / max(mse, 1e-12))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--beta", type=float, default=0.25)
    p.add_argument("--hidden_channels", type=int, default=64)
    p.add_argument("--channel_mult", type=str, default="1,2,4")
    p.add_argument("--num_res_blocks", type=int, default=2)
    p.add_argument("--z_channels", type=int, default=32)
    p.add_argument("--num_embeddings", type=int, default=512)
    p.add_argument("--revive_every", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval_crops", type=int, default=64)
    args = p.parse_args()

    import optax

    cfg = VQGANConfig.get_default_config(dict(
        resolution=args.resolution,
        hidden_channels=args.hidden_channels,
        channel_mult=tuple(int(x) for x in args.channel_mult.split(",")),
        num_res_blocks=args.num_res_blocks,
        z_channels=args.z_channels,
        num_embeddings=args.num_embeddings,
        quantized_embed_dim=args.z_channels,
    ))
    model = VQGANModel(cfg)
    rng = np.random.RandomState(args.seed)
    imgs = load_images(args.image_dir, args.resolution)
    print(f"{len(imgs)} images; training {args.steps} steps "
          f"at {args.resolution}px", file=sys.stderr, flush=True)

    params = jax.jit(lambda r, x: model.init(r, x))(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, args.resolution, args.resolution, 3), jnp.float32),
    )["params"]
    tx = optax.adamw(args.lr, weight_decay=1e-5)
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def step(params, opt_state, x):
        def loss_fn(params):
            recon, z, z_q_raw, idx = model.apply(
                {"params": params}, x, method=model.train_forward
            )
            l_rec = jnp.mean((recon - x) ** 2)
            l_code = jnp.mean((jax.lax.stop_gradient(z) - z_q_raw) ** 2)
            l_commit = jnp.mean((z - jax.lax.stop_gradient(z_q_raw)) ** 2)
            loss = l_rec + l_code + args.beta * l_commit
            used = jnp.zeros(args.num_embeddings).at[idx.reshape(-1)].add(1.0)
            return loss, (l_rec, used)

        (loss, (l_rec, used)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, l_rec, used

    usage = np.zeros(args.num_embeddings)
    t0 = time.time()
    for i in range(args.steps):
        x = jnp.asarray(crop_batch(imgs, rng, args.batch, args.resolution))
        params, opt_state, loss, l_rec, used = step(params, opt_state, x)
        usage += np.asarray(jax.device_get(used))
        if (i + 1) % args.revive_every == 0:
            # dead-code revival: re-seed unused embeddings to random
            # encoder outputs (host-side surgery between jitted steps)
            dead = np.where(usage == 0)[0]
            if dead.size:
                _, z, _, _ = jax.device_get(model.apply(
                    {"params": params}, x, method=model.train_forward
                ))
                flat = np.asarray(z).reshape(-1, z.shape[-1])
                emb = np.array(params["quantize"]["embeddings"])  # owned copy
                emb[dead] = flat[rng.randint(len(flat), size=dead.size)]
                params = dict(params)
                params["quantize"] = {"embeddings": jnp.asarray(emb)}
            usage[:] = 0
        if (i + 1) % 100 == 0:
            print(f"step {i+1}: loss {float(jax.device_get(loss)):.4f} "
                  f"rec {float(jax.device_get(l_rec)):.4f} "
                  f"({(time.time()-t0)/(i+1):.2f}s/step)",
                  file=sys.stderr, flush=True)

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "wb") as f:
        pickle.dump(jax.device_get(params), f)  # released pickle layout
    print(f"saved {args.output}", file=sys.stderr, flush=True)

    # held-out round trip THROUGH THE WRAPPER (the released-artifact path)
    from lwm_tpu.models.vqgan import VQGAN

    vq = VQGAN(args.output, config_updates=dict(
        resolution=args.resolution,
        hidden_channels=args.hidden_channels,
        channel_mult=tuple(int(x) for x in args.channel_mult.split(",")),
        num_res_blocks=args.num_res_blocks,
        z_channels=args.z_channels,
        num_embeddings=args.num_embeddings,
        quantized_embed_dim=args.z_channels,
    ))
    eval_rng = np.random.RandomState(args.seed + 1)
    x = crop_batch(imgs, eval_rng, args.eval_crops, args.resolution)
    _, codes = vq.encode(jnp.asarray(x))
    codes = np.asarray(jax.device_get(codes))
    recon = np.asarray(jax.device_get(vq.decode(jnp.asarray(codes))))
    uniq = len(np.unique(codes))
    print(
        f"round-trip: PSNR {psnr(x, recon):.2f} dB on {args.eval_crops} "
        f"held-out {args.resolution}px crops; codebook usage "
        f"{uniq}/{args.num_embeddings} codes"
    )


if __name__ == "__main__":
    main()
