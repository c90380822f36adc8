"""A/B the beam service's conditional cache-gather skip (VERDICT r3 #6).

Each beam micro-step reorders every slot's K cache rows by parent beam —
L x (R, Tc, D) x 2 gathers that roughly triple per-step cache traffic.
Once beams settle or finish, ``src_beam`` is the identity (top_k is
stable; finished beams extend with PAD at zero incremental score), so
the production window wraps the gather in ``lax.cond``. This measures
the same service loop with the cond (MIT_BEAM_GATHER_SKIP=1, default)
vs the unconditional gather (=0), random weights, max_len == cache_len
so every caption runs the full bucket (worst case for the skip: no END
exits, reorders keep happening while scores stay random — real trained
beams settle earlier, so the production win is at least this one).

Run twice (the toggle is trace-time): MIT_BEAM_GATHER_SKIP=0 python ...
prints the base line; default prints the skip line. One JSON line each.
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

    def run():
        svc = CaptionService(cap, num_slots=slots, max_len=16,
                             compute_dtype=jnp.bfloat16, method="beam",
                             beam_size=3, steps_per_sync=12)
        for i in range(reqs):
            svc.submit_memory(mem[i])
        t0 = time.perf_counter()
        svc.run_to_completion()
        return reqs / (time.perf_counter() - t0)

    run()                      # compile
    vals = [run() for _ in range(reps)]
    print(json.dumps({
        "metric": "service_beam3_caps_per_sec",
        "gather_skip": os.environ.get("MIT_BEAM_GATHER_SKIP", "1"),
        "value": round(float(np.median(vals)), 1),
        "reps": [round(v, 1) for v in vals],
        "slots": slots, "requests": reqs, "beam": 3,
    }))


if __name__ == "__main__":
    main()
