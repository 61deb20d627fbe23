"""Validate tile-sweep winners END-TO-END: full llama-7B w4a8 decode with
pinned per-shape tile tables. The microbench differencing is noisy (and
produced impossible numbers for some configs); one full-model number per
config is the ground truth.

Usage: /opt/venv/bin/python experiments/r2_model_tiles.py [bits]
"""

import sys

import jax.numpy as jnp

from bench import llama7b_spec, measure_decode, synth_packed_params
from gptq_tpu.ops import autotune


def set_tiles(table, bits, groupsize=-1, act="int8"):
    """table: {(K, N): (tk, tn)} pinned for this run."""
    autotune._load()
    for (K, N), tiles in table.items():
        key = autotune._key(K, N, bits, groupsize, "uniform", 8, act)
        autotune._TABLE[key] = tiles


CONFIGS = {
    # (K,N) -> (tk,tn); shapes: qkv (4096,12288), o (4096,4096),
    # gateup (4096,22528), down (11008,4096 logical; Kp 11264)
    "default": None,
    "t1024x2048": {(4096, 12288): (1024, 2048), (4096, 4096): (1024, 2048),
                   (4096, 22528): (1024, 2048), (11008, 4096): (1024, 2048)},
    "t2048x2048": {(4096, 12288): (2048, 2048), (4096, 4096): (2048, 2048),
                   (4096, 22528): (2048, 2048), (11008, 4096): (1024, 2048)},
    "fullN": {(4096, 12288): (512, 12288), (4096, 4096): (512, 4096),
              (4096, 22528): (1024, 2048), (11008, 4096): (512, 4096)},
    "mix": {(4096, 12288): (2048, 2048), (4096, 4096): (1024, 4096),
            (4096, 22528): (4096, 1024), (11008, 4096): (1024, 4096)},
}


def main():
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(CONFIGS)
    spec = llama7b_spec()
    params = synth_packed_params(spec, bits=bits)
    results = {}
    for name in names:
        table = CONFIGS[name]
        autotune._TABLE.clear()
        autotune._LOADED = True  # block the on-disk table from loading
        if table:
            set_tiles(table, bits)
        try:
            t = measure_decode(spec, params, a8=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {e}"[:200], flush=True)
            continue
        results[name] = t
        print(f"{name}: {t*1e3:.3f} ms/token ({1/t:.1f} tok/s)", flush=True)
    if results:
        best = min(results, key=results.get)
        print(f"best: {best} at {results[best]*1e3:.3f} ms/token")


if __name__ == "__main__":
    main()
