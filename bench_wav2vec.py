"""Secondary benchmark: wav2vec2 (XLSR-53 large) layer-19 extraction rate.

BASELINE.json config 3 ("wav2vec2 speech feature extraction pipeline in
JAX").  Measures the jitted batched chunk forward at the reference's run
shape — 10 s chunks (8 s segment + 2 s overlap, ref
``create_wav2vec.py:146``) at 16 kHz, tap layer 19 — in audio-seconds
processed per wall-second.

Methodology note: inputs VARY per call and a scalar is fetched per call;
on the tunneled TPU backend, repeated identical calls and plain
``block_until_ready`` report impossibly fast times (>hardware peak), so
neither is trusted here.

Prints one JSON line: {"metric": "wav2vec_extraction", "value": N,
"unit": "audio_s_per_s", ...}.
"""

import json
import sys
import time

import numpy as np

CHUNK = 160000  # 10 s @ 16 kHz
BATCH = 16
TAP = 19
CALLS = 4


def measure(dtype_name: str = "float32") -> float:
    import jax
    import jax.numpy as jnp

    from transformer_clip_eeg_tpu.models.wav2vec2 import (
        Wav2Vec2Config,
        Wav2Vec2Model,
    )

    cfg = Wav2Vec2Config()  # XLSR-53 large
    # scan_layers: the production extraction path (preprocess/wav2vec.py
    # default) — one nn.scan over stacked layer params, O(1) program size
    # in depth; the unrolled 24-layer HLO timed out in remote compile
    model = Wav2Vec2Model(cfg, dtype=jnp.dtype(dtype_name), scan_layers=True)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 16000), np.float32),
        tap_layer=TAP,
    )
    fwd = jax.jit(lambda v, a: model.apply(v, a, tap_layer=TAP).sum())

    rng = np.random.default_rng(0)
    inputs = [
        jnp.asarray(rng.standard_normal((BATCH, CHUNK)) * 0.1, jnp.float32)
        for _ in range(CALLS)
    ]
    float(fwd(variables, inputs[0]))  # compile + warmup

    t0 = time.perf_counter()
    for x in inputs:
        float(fwd(variables, x))
    dt = (time.perf_counter() - t0) / CALLS
    return BATCH * CHUNK / 16000 / dt


def main():
    value = measure("float32")
    print(
        json.dumps(
            {
                "metric": "wav2vec_extraction",
                "value": round(value, 1),
                "unit": "audio_s_per_s",
                "config": "XLSR-53 large, tap layer 19, 10 s chunks, batch 16",
            }
        )
    )


if __name__ == "__main__":
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    main()
