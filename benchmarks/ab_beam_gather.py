"""Same-run A/B of the beam service's conditional cache-gather skip.

Each beam micro-step reorders every slot's K cache rows by parent beam —
L x (R, Tc, D) x 2 gathers that roughly triple per-step cache traffic.
Once beams settle or finish, ``src_beam`` is the identity (top_k is
stable; finished beams extend with PAD at zero incremental score), so
the production window wraps the gather in ``lax.cond``
(``service_beam_window(gather_skip=True)``, the default).

Round-5 form (VERDICT r4 weak #4): ``gather_skip`` is a jit-STATIC
constructor knob, so BOTH variants trace in ONE process and the reps
interleave skip/base — tunnel drift hits both arms equally. Random
weights with max_len == cache_len is the worst case for the skip (no END
exits, scores stay random so reorders keep firing). A token-identity
check (skip vs base captions) gates the numbers.

OUTCOME (round 5): the skip LOST in every regime measured — 0.977 here
(worst case, ab_beam_gather_r05.json) and ~0.90 with a TRAINED decoder
whose beams genuinely settle at 12 tokens, bucketed or not
(MIT_BENCH_BEAM_AB=1 in bench_service.py, bench_beam_ladder_r05.json):
the lax.cond is a fusion barrier inside the scanned window and its
any() predicate is a per-microstep reduction. The service default is
now gather_skip=False; this harness documents why.

Prints one JSON line; also writes benchmarks/ab_beam_gather_r05.json
when run from the repo root.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from mit_tpu.config import Config
from mit_tpu.decode.api import Captioner
from mit_tpu.decode.service import CaptionService
from mit_tpu.models.model import ModelConfig, init_model_params


class _Tok:
    pad_id, start_id, end_id = 0, 2, 3

    def decode(self, ids, skip_special_tokens=False):
        return " ".join(map(str, ids))


def main():
    slots = int(os.environ.get("AB_SLOTS", 170))
    reqs = int(os.environ.get("AB_REQS", 512))
    reps = int(os.environ.get("AB_REPS", 3))
    cfg = Config()
    mcfg = ModelConfig.build(cfg, vocab_size=10000)
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    cap = Captioner(params, mcfg, _Tok(), cfg, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mem = rng.standard_normal((reqs, 1, mcfg.decoder.embed_dim)).astype(
        np.float32)

    def run(skip, collect=False):
        svc = CaptionService(cap, num_slots=slots, max_len=16,
                             compute_dtype=jnp.bfloat16, method="beam",
                             beam_size=3, steps_per_sync=12,
                             beam_gather_skip=skip)
        rids = [svc.submit_memory(mem[i]) for i in range(reqs)]
        t0 = time.perf_counter()
        got = svc.run_to_completion()
        dt = time.perf_counter() - t0
        return reqs / dt, ([got[r] for r in rids] if collect else None)

    # compile both variants, and gate on token identity before timing
    _, caps_skip = run(True, collect=True)
    _, caps_base = run(False, collect=True)
    identical = caps_skip == caps_base
    if not identical:
        bad = sum(a != b for a, b in zip(caps_skip, caps_base))
        print(f"WARNING: {bad}/{reqs} captions differ between skip/base "
              "— numbers below are NOT comparable", file=sys.stderr)

    vals = {True: [], False: []}
    for _ in range(reps):                      # interleaved arms
        for skip in (True, False):
            vals[skip].append(run(skip)[0])
    med = {k: float(np.median(v)) for k, v in vals.items()}
    out = {
        "metric": "service_beam3_caps_per_sec",
        "skip_caps_per_sec": round(med[True], 1),
        "base_caps_per_sec": round(med[False], 1),
        "speedup": round(med[True] / med[False], 3),
        "reps_skip": [round(v, 1) for v in vals[True]],
        "reps_base": [round(v, 1) for v in vals[False]],
        "token_identical": identical,
        "slots": slots, "requests": reqs, "beam": 3, "max_len": 16,
        "note": "random weights, full-length captions — worst case for "
                "the skip; trained beams settle earlier",
    }
    print(json.dumps(out))
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ab_beam_gather_r05.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
