"""Decode-side breakdown at the headline geometry (B=2048, 12 steps).

The r3 pipeline breakdown (`ab_pipeline_breakdown.py`) put the 12-step
decode at ~51 ms — ~4.2 ms/step against a ~1.5 ms/step traffic+FLOP floor
(6L x 2 x (B,16,D) bf16 cache reads ~400 MB + a 21 GFLOP logits GEMM).
This isolates where the rest goes, same-run:

  xla12      greedy_generate, bucket 13 (12 steps), XLA step — production
  fused12    same with MIT_FUSED_DECODE=1 (whole-layer Pallas step kernel)
  scan12     decoder_step scanned 12x with fixed tokens (no while_loop
             cond, no argmax/done bookkeeping) — loop-machinery cost
  logits12   the per-step (B, D) x (D, V) logits GEMM alone, scanned 12x
  body12     scan12 with the logits GEMM replaced by a (B, D) mean —
             the 6-layer step body alone

Every variant runs AB_ITERS (default 8) full decodes INSIDE one jit
(shift-rolled memory per iter) behind a single dependent fetch — a
one-application dispatch "takes" tunnel-RTT + device time, and at this
geometry RTT (~27 ms) exceeds the decode itself (~16 ms device-profiled),
so unamortized numbers are RTT readings, not decode readings (the same
pitfall BENCHMARKS.md records for the GEMM probes).

Interleaved reps, medians. Env: AB_BATCH, AB_REPS, AB_STEPS, AB_ITERS.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from mit_tpu.config import Config
from mit_tpu.decode.greedy import greedy_generate
from mit_tpu.decode.step import (decoder_step, init_cache,
                                 prepare_decode_params, set_fused_decode)
from mit_tpu.models.model import ModelConfig, init_model_params

B = int(os.environ.get("AB_BATCH", 2048))
REPS = int(os.environ.get("AB_REPS", 3))
STEPS = int(os.environ.get("AB_STEPS", 12))
ITERS = int(os.environ.get("AB_ITERS", 8))
cd = jnp.bfloat16

cfg = Config()
mcfg = ModelConfig.build(cfg, vocab_size=10000)
dcfg = mcfg.decoder
D = dcfg.embed_dim
params = init_model_params(jax.random.PRNGKey(0), mcfg)
dec = params["decoder"]
prep = prepare_decode_params(dec, cd)
rng = np.random.default_rng(0)
memory = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.float32)

T_CACHE = STEPS + 1


def _amortize(one_pass):
    """Run ``one_pass(mem, shift)`` ITERS times inside one jit, chaining a
    scalar so no pass is dead code, behind one dependent fetch."""
    def run(mem, shift):
        def body(carry, i):
            return carry + one_pass(mem, shift + i).astype(jnp.float32), ()
        out, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32),
            jnp.arange(ITERS, dtype=jnp.int32))
        return out
    return run


def _greedy(mem, shift):
    mem = jnp.roll(mem, shift, axis=0)
    tok, ln = greedy_generate(dec, dcfg, mem, 2, 3, 0, T_CACHE,
                              compute_dtype=cd)
    return tok[0, 0] + ln[0]


greedy_j = jax.jit(_amortize(_greedy))


def _scan12(mem, shift):
    mem = jnp.roll(mem, shift, axis=0)
    cache = init_cache(dec, dcfg, mem.astype(cd), None, T_CACHE, cd)
    def body(carry, i):
        tok, cache = carry
        logits, cache = decoder_step(prep, dcfg, tok, i, cache, cd)
        return (jnp.argmax(logits, -1).astype(jnp.int32), cache), ()
    (tok, _), _ = jax.lax.scan(
        body, (jnp.full((B,), 2, jnp.int32), cache),
        jnp.arange(STEPS, dtype=jnp.int32))
    return tok[0]


scan12 = jax.jit(_amortize(_scan12))


def _body12(mem, shift):
    """scan12 minus the logits GEMM: the step body feeds a cheap reduction
    and the 'token' is a constant (still data-dependent on x via min)."""
    mem = jnp.roll(mem, shift, axis=0)
    cache = init_cache(dec, dcfg, mem.astype(cd), None, T_CACHE, cd)
    fake_w = prep["fc_w"][:, :128]          # (D, 128) — negligible GEMM
    def body(carry, i):
        tok, cache = carry
        # inline decoder_step's body with the tiny head instead of 10k
        logits, cache = decoder_step(
            {**prep, "fc_w": fake_w, "fc_b": prep["fc_b"][:128]},
            dcfg, tok, i, cache, cd)
        return (jnp.argmax(logits, -1).astype(jnp.int32), cache), ()
    (tok, _), _ = jax.lax.scan(
        body, (jnp.full((B,), 2, jnp.int32), cache),
        jnp.arange(STEPS, dtype=jnp.int32))
    return tok[0]


body12 = jax.jit(_amortize(_body12))


def _logits12(mem, shift):
    x0 = jnp.roll(mem, shift, axis=0)[:, 0, :].astype(cd)
    def body(x, _):
        lg = jnp.dot(x, prep["fc_w"],
                     preferred_element_type=jnp.float32) + prep["fc_b"]
        # feed a (B, D) value back so steps chain
        return (x + lg[:, :D].astype(cd) * 1e-6), ()
    x, _ = jax.lax.scan(body, x0, None, length=STEPS)
    return x[0, 0]


logits12 = jax.jit(_amortize(_logits12))


def timed(fn, shift):
    t0 = time.perf_counter()
    np.asarray(fn(memory, jnp.int32(shift)))
    return time.perf_counter() - t0


VARIANTS = {"xla12": greedy_j, "scan12": scan12, "body12": body12,
            "logits12": logits12}

# compile
for name, fn in VARIANTS.items():
    t0 = time.perf_counter()
    np.asarray(fn(memory, jnp.int32(0)))
    print(f"compile {name}: {time.perf_counter()-t0:.1f}s", flush=True)

# fused path as an AOT executable: env-toggling + jax.clear_caches between
# reps would put retraces inside the timed region; .lower().compile() gives
# an executable handle independent of the live jit cache
os.environ["MIT_FUSED_DECODE"] = "1"
try:
    t0 = time.perf_counter()
    fused_exe = jax.jit(
        _amortize(lambda m, s: _greedy(m, s))
    ).lower(memory, jnp.int32(0)).compile()
    np.asarray(fused_exe(memory, jnp.int32(0)))
    print(f"compile fused12: {time.perf_counter()-t0:.1f}s", flush=True)
    VARIANTS["fused12"] = fused_exe
except Exception as e:
    print(f"fused12 FAILED: {type(e).__name__}: {str(e)[:120]}")
finally:
    os.environ.pop("MIT_FUSED_DECODE", None)

results = {k: [] for k in VARIANTS}
for rep in range(1, REPS + 1):
    for name in list(results):
        results[name].append(timed(VARIANTS[name], rep))

print()
for name, xs in results.items():
    ms = 1e3 * float(np.median(xs)) / ITERS
    print(f"{name:9s} {ms:7.1f} ms/pass  ({ms/STEPS:5.2f} ms/step, "
          f"x{ITERS} amortized)  "
          f"reps {['%.1f' % (1e3*x/ITERS) for x in xs]}", flush=True)
