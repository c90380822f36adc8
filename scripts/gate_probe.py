#!/usr/bin/env python
"""Linear-probe the gate's representation ceiling, per attribute.

The compositional gate's train-val BLEU pins at ~0.5 == its held-out
BLEU — the signature of a representation limit, not underfitting
(gate_diagnose.py locates WHICH attribute; this script measures WHY and
tests candidate fixes without paying a full gate run). For each render
variant it: renders N labeled images, pushes them through the FROZEN
random-init ViT-B (the gate's flagship config) to CLS features, fits a
multinomial logistic probe per attribute (color / shape / position),
and reports held-out probe accuracy. A probe ceiling near chance for an
attribute means NO amount of decoder training can caption it — the
attribute is invisible to the frozen random CLS — and a render variant
that lifts the probe lifts the gate's reachable BLEU.

Variants:
  current    — the gate's render as committed (s in [26,38), noisy bg)
  big        — s in [48,64): shapes cover ~4x the area
  cleanbg    — constant mid-gray background (no per-pixel noise)
  big+clean  — both

Usage: python scripts/gate_probe.py [--n_per 64] [--steps 400]
Prints one JSON line; writes benchmarks/gate_probe_r05.json from repo
root.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import compositional_gate as cg


def render_variant(rng, color_rgb, shape, pos_yx, s_lo, s_hi, noisy_bg):
    img = (rng.integers(95, 160, (224, 224, 3)) if noisy_bg
           else np.full((224, 224, 3), 127)).astype(np.uint8)
    cy = int(pos_yx[0] + rng.integers(-12, 13))
    cx = int(pos_yx[1] + rng.integers(-12, 13))
    s = int(rng.integers(s_lo, s_hi))
    m = cg.shape_mask(shape, cy, cx, s)
    jitter = np.clip(
        np.asarray(color_rgb, np.int16) + rng.integers(-20, 21, 3), 0, 255
    ).astype(np.uint8)
    img[m] = jitter
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_per", type=int, default=64,
                    help="images per (shape) class per variant; colors/"
                    "positions sampled uniformly")
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    from mit_tpu.config import Config
    from mit_tpu.data.preprocess import device_preprocess
    from mit_tpu.models.model import ModelConfig, encode_images, \
        init_model_params

    cfg = Config()
    mcfg = ModelConfig.build(cfg, vocab_size=100)
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    spec = cfg.ENCODER_MODEL_NAME

    # params ride as an ARGUMENT — a closure would bake all 86M encoder
    # weights into the HLO as constants and blow the tunnel's compile
    # request size limit (HTTP 413)
    @jax.jit
    def feats_of(p, u8):
        px = device_preprocess(u8, spec)
        return encode_images(p, mcfg, px, jnp.bfloat16).astype(
            jnp.float32)[:, 0, :]

    colors = list(cg.COLORS)
    shapes = list(cg.SHAPES)
    positions = list(cg.POSITIONS)
    variants = {
        "current": (26, 38, True),
        "big": (48, 64, True),
        "cleanbg": (26, 38, False),
        "big_clean": (48, 64, False),
    }

    from functools import partial

    # data rides as ARGUMENTS (a closure would bake the feature matrix
    # into the HLO as a constant — the tunnel's compile request has a
    # body-size limit) and the GD loop is a fori_loop: one small compile
    # per n_cls, reused across variants.
    @partial(jax.jit, static_argnames=("n_cls", "steps"))
    def fit(xtr, ytr, n_cls, steps):
        d = xtr.shape[1]

        def loss_fn(wb):
            w, b = wb
            lp = jax.nn.log_softmax(xtr @ w + b)
            nll = -jnp.take_along_axis(lp, ytr[:, None], axis=1).mean()
            return nll + 1e-3 * jnp.sum(w * w)

        def body(_, wb):
            gw, gb = jax.grad(loss_fn)(wb)
            return (wb[0] - 0.5 * gw, wb[1] - 0.5 * gb)

        return jax.lax.fori_loop(
            0, steps, body, (jnp.zeros((d, n_cls)), jnp.zeros((n_cls,))))

    def probe(x, y, n_cls, rng_np):
        """Multinomial logistic regression, full-batch GD; holdout acc."""
        n = len(x)
        idx = rng_np.permutation(n)
        n_tr = int(0.8 * n)
        tr, te = idx[:n_tr], idx[n_tr:]
        mu, sd = x[tr].mean(0), x[tr].std(0) + 1e-6
        xn = (x - mu) / sd
        w, b = fit(jnp.asarray(xn[tr]), jnp.asarray(y[tr]), n_cls,
                   args.steps)
        pred = np.argmax(xn[te] @ np.asarray(w) + np.asarray(b), axis=1)
        return float((pred == y[te]).mean())

    out = {"metric": "gate_cls_probe", "n_images_per_variant":
           args.n_per * len(shapes), "encoder": "frozen random ViT-B (the "
           "gate's flagship config)"}
    for name, (s_lo, s_hi, noisy) in variants.items():
        rng = np.random.default_rng(11)
        imgs, lab = [], {"color": [], "shape": [], "position": []}
        for si, shape in enumerate(shapes):
            for i in range(args.n_per):
                ci = int(rng.integers(0, len(colors)))
                pi = int(rng.integers(0, len(positions)))
                imgs.append(render_variant(
                    rng, cg.COLORS[colors[ci]], shape,
                    cg.POSITIONS[positions[pi]], s_lo, s_hi, noisy))
                lab["color"].append(ci)
                lab["shape"].append(si)
                lab["position"].append(pi)
        u8 = np.stack(imgs)
        feats = []
        for i in range(0, len(u8), 64):
            feats.append(np.asarray(feats_of(params,
                                             jnp.asarray(u8[i:i + 64]))))
        x = np.concatenate(feats)
        rng_np = np.random.default_rng(3)
        out[name] = {
            "color_acc": round(probe(x, np.asarray(lab["color"]),
                                     len(colors), rng_np), 4),
            "shape_acc": round(probe(x, np.asarray(lab["shape"]),
                                     len(shapes), rng_np), 4),
            "position_acc": round(probe(x, np.asarray(lab["position"]),
                                        len(positions), rng_np), 4),
        }
        print(f"{name}: {out[name]}", file=sys.stderr)
    out["chance"] = {"color": round(1 / len(colors), 3),
                     "shape": round(1 / len(shapes), 3),
                     "position": round(1 / len(positions), 3)}
    print(json.dumps(out))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = os.path.join(root, "benchmarks", "gate_probe_r05.json")
    if os.path.isdir(os.path.dirname(art)):
        with open(art, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
