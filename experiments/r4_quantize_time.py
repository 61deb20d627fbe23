"""Round 4 (VERDICT r3 #4): full-model GPTQ quantization wall-clock on
the chip at llama-7B layer shapes — the reference prints per-layer and
total quantization time (reference: gptq.py:293, opt.py:691; a 7B-class
model takes tens of minutes per GPU on its serial per-column torch loop).

Protocol: synthetic dense llama-7B-shape model, reference calibration
size (nsamples x 2048 tokens), the REAL pipeline end-to-end — embed,
per-layer capture -> Hessian -> blocked GPTQ solve for all 7 linears ->
write-back -> replay — then pack. Device HBM fits 8 of 32 layers in f32
alongside Hessians/activations on one 16 GB chip, so the model runs at
n_layers=8 and the 32-layer figure is 4x the per-layer steady state plus
the fixed embed/pack cost (layer cost is constant by construction).

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
       experiments/r4_quantize_time.py [--nsamples 128] [--layers 8]
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.io import enable_compilation_cache

# cache must be enabled before any module import triggers a compile
enable_compilation_cache()

from bench import llama7b_spec  # noqa: E402
from gptq_tpu.config import QuantConfig  # noqa: E402
from gptq_tpu.models.common import init_params  # noqa: E402
from gptq_tpu.pipeline import pack_model, quantize_model  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--nsamples", type=int, default=128)
ap.add_argument("--layers", type=int, default=8)
ap.add_argument("--wbits", type=int, default=4)
args = ap.parse_args()

import dataclasses  # noqa: E402

spec = dataclasses.replace(llama7b_spec(), n_layers=args.layers)
params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
jax.block_until_ready(params["layers"][0]["q"]["w"])

calib = jnp.asarray(np.random.default_rng(0).integers(
    0, spec.vocab, size=(args.nsamples, 2048)))
cfg = QuantConfig(wbits=args.wbits, nsamples=args.nsamples)

layer_times = []


def log(s):
    print(f"[{time.perf_counter() - T0:8.2f}s] {s}")
    if " done in " in s:  # pipeline per-layer timing lines
        layer_times.append(float(s.split(" done in ")[1].rstrip("s")))


T0 = time.perf_counter()
res = quantize_model(spec, params, calib, cfg, log=log)
t_quant = time.perf_counter() - T0
t0p = time.perf_counter()
pack_model(spec, params, res.quantizers, cfg)
jax.block_until_ready(params["layers"][0]["q"]["w"].words)
t_pack = time.perf_counter() - t0p

per_layer = np.median(layer_times[1:]) if len(layer_times) > 1 else (
    t_quant / args.layers)
proj32 = (t_quant - args.layers * per_layer) + 32 * per_layer + t_pack * 4
print(f"\nquantize {args.layers}L llama-7B-shape, nsamples={args.nsamples}, "
      f"w{args.wbits}: {t_quant:.1f} s (+pack {t_pack:.1f} s)")
print(f"per-layer steady state: {per_layer:.2f} s "
      f"(median of {len(layer_times)-1} warm layers)")
print(f"projected 32-layer full model: {proj32:.1f} s")
print("DONE")
