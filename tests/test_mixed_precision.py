"""Mixed-precision path: bf16 encoders, f32 loss math."""

import jax
import jax.numpy as jnp
import numpy as np

from transformer_clip_eeg_tpu.models.encoders import SpeechSmallConv
from transformer_clip_eeg_tpu.models.heads import CLIPSimNoLatentProj
from transformer_clip_eeg_tpu.train.state import init_train_state, make_optimizer
from transformer_clip_eeg_tpu.train.steps import make_train_step


def tiny_model():
    eeg = SpeechSmallConv(
        output_dim=4, kernel_size_temporal=8, dropout_rate=0.0,
        speech_dim=64, time_dimension=32,
    )
    speech = SpeechSmallConv(
        output_dim=4, kernel_size_temporal=8, dropout_rate=0.0,
        speech_dim=8, time_dimension=32,
    )
    return CLIPSimNoLatentProj(
        eegModel=eeg, speechModel=speech, bank_size=64,
        latent_dim=speech.get_output_dim(32), temperature=0.075,
        window_length=32,
    )


def test_bf16_step_close_to_f32():
    model = tiny_model()
    rng = np.random.default_rng(0)
    batch = {
        "eeg": rng.standard_normal((16, 32, 64)).astype(np.float32),
        "speech": rng.standard_normal((16, 32, 8)).astype(np.float32),
        "ids": np.arange(1, 17, dtype=np.int32),
    }
    tx = make_optimizer("adamw", 1e-3)
    key = jax.random.PRNGKey(7)

    losses = {}
    for dtype in (None, "bfloat16"):
        state = init_train_state(
            model, jax.random.PRNGKey(0),
            (batch["eeg"], batch["speech"], batch["ids"]), tx,
        )
        step = make_train_step(
            "clip_sim_no_latent_proj", donate=False, compute_dtype=dtype
        )
        for _ in range(3):
            state, l = step(state, batch, key, warmup=False)
        losses[dtype] = float(l["loss_ce"])
        # loss math stays f32 regardless of encoder dtype
        assert l["loss_ce"].dtype == jnp.float32

    assert np.isfinite(losses["bfloat16"])
    # bf16 encoders drift from f32 but the contrastive loss stays close
    assert abs(losses["bfloat16"] - losses[None]) < 0.1


def test_bf16_encoder_output_dtype():
    model = tiny_model()
    rng = np.random.default_rng(1)
    eeg = rng.standard_normal((4, 32, 64)).astype(np.float32)
    speech = rng.standard_normal((4, 32, 8)).astype(np.float32)
    ids = np.arange(1, 5, dtype=np.int32)
    variables = model.init(jax.random.PRNGKey(0), eeg, speech, ids)
    out = model.apply(
        variables, eeg.astype(jnp.bfloat16), method=model.encode_eeg
    )
    assert out.dtype == jnp.bfloat16
