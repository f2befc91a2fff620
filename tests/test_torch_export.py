"""Export direction of checkpoint interop: flax variables → reference-layout
torch ``state_dict``.

``utils.torch_export`` completes the interop story: a model trained by this
framework loads into the reference driver (``train_clip_final.py:443-449``
consumes a bare ``torch.save``d state_dict).  The reference at
/root/reference is imported read-only as the test oracle.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

sys.path.insert(0, "/root/reference")
import clip_model as ref_clip  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from transformer_clip_eeg_tpu.models import (  # noqa: E402
    CLIPKLDNoLatentProj,
    CLIPSimNoLatentProj,
    EEGConformerInterleaved,
    EEGConvLSTM,
    MelModel,
)
from transformer_clip_eeg_tpu.utils.torch_export import (  # noqa: E402
    export_state_dict,
    save_torch_checkpoint,
)
from transformer_clip_eeg_tpu.utils.torch_import import (  # noqa: E402
    convert_encoder,
    convert_head,
)

WL = 192


def _flagship_pair(seed=0):
    torch.manual_seed(seed)
    t_eeg = ref_clip.EEGConformerInterleaved(
        output_dim=8, conformer_input_dim=64, filters=(64,), kernels=(64,),
        time_dimension=WL, depth=1,
    )
    t_sp = ref_clip.EEGConvLSTM(
        units_lstm=16, output_dim=8, eeg_dim=40, filters=(64,), kernels=(32,),
        input_channels=40, time_dimension=WL,
    )
    t_bank = ref_clip.memoryBank(
        bank_size=40, device=torch.device("cpu"), dim=WL * 8
    )
    t_head = ref_clip.CLIPSimNoLatentProj(
        t_eeg, t_sp, t_bank, temperature=0.075, window_length=WL,
        lambda_clip=1.0, lambda_average=0.5,
    ).eval()
    j_eeg = EEGConformerInterleaved(
        output_dim=8, conformer_input_dim=64, filters=(64,), kernels=(64,),
        time_dimension=WL, depth=1,
    )
    j_sp = EEGConvLSTM(
        units_lstm=16, output_dim=8, eeg_dim=40, filters=(64,), kernels=(32,),
        time_dimension=WL,
    )
    j_head = CLIPSimNoLatentProj(
        eegModel=j_eeg, speechModel=j_sp, bank_size=40, latent_dim=WL * 8,
        temperature=0.075, window_length=WL, lambda_clip=1.0,
        lambda_average=0.5,
    )
    return t_head, j_head


def _sd_equal(a, b):
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        av = a[k].detach().numpy() if hasattr(a[k], "detach") else np.asarray(a[k])
        bv = b[k].detach().numpy() if hasattr(b[k], "detach") else np.asarray(b[k])
        np.testing.assert_array_equal(av, bv, err_msg=k)


def test_export_round_trips_flagship_state_dict():
    """import → export must reproduce the original state_dict bit-exactly,
    with nothing falling back to template values."""
    t_head, _ = _flagship_pair()
    sd = t_head.state_dict()
    variables = convert_head(t_head)
    out, report = export_state_dict(variables, sd)
    assert report == []
    _sd_equal(sd, out)


def test_export_round_trips_batchnorm_lstm_strided_conv():
    """MelModel covers BatchNorm (params + batch_stats + the
    num_batches_tracked keep), valid-time strided Conv2d, and LSTM."""
    torch.manual_seed(1)
    t_enc = ref_clip.MelModel(
        spatial_filters=8, filters_cnn=16, kerSize_temporal=9,
        stride_temporal=3, units_lstm=32, padding="valid",
        activation=tnn.LeakyReLU(), speech_dim=28,
    ).eval()
    sd = t_enc.state_dict()
    variables = convert_encoder(t_enc)
    out, report = export_state_dict(variables, sd)
    # only the BatchNorm counters have no flax analogue
    assert report == sorted(k for k in sd if k.endswith("num_batches_tracked"))
    _sd_equal(sd, out)


def test_export_round_trips_kld_embedding_table():
    torch.manual_seed(2)
    t_eeg = ref_clip.EEGConformerInterleaved(
        output_dim=8, conformer_input_dim=64, filters=(64,), kernels=(64,),
        time_dimension=WL, depth=1,
    )
    t_sp = ref_clip.EEGConvLSTM(
        units_lstm=16, output_dim=8, eeg_dim=40, filters=(64,), kernels=(32,),
        input_channels=40, time_dimension=WL,
    )
    t_head = ref_clip.CLIPKLDNoLatentProj(
        t_eeg, t_sp, latent_dimension=WL * 8, number_of_classes=25,
        temperature=0.075, window_length=WL, lambda_clip=1.0,
        lambda_lower_bound=0.1,
    ).eval()
    sd = t_head.state_dict()
    out, report = export_state_dict(convert_head(t_head), sd)
    assert report == []
    _sd_equal(sd, out)


def test_fresh_flax_init_runs_in_reference_code(rng, tmp_path):
    """The real seal: a model initialized (as if trained) by THIS framework,
    exported with save_torch_checkpoint, must load strict into the reference
    module and produce the same losses the flax model computes."""
    t_head, j_head = _flagship_pair()
    bs = 6
    eeg = rng.standard_normal((bs, WL, 64)).astype(np.float32)
    speech = rng.standard_normal((bs, WL, 40)).astype(np.float32)
    ids = rng.choice(40, size=bs, replace=False).astype(np.int64)

    variables = j_head.init(
        {"params": jax.random.PRNGKey(3), "membank": jax.random.PRNGKey(4)},
        jnp.asarray(eeg), jnp.asarray(speech), jnp.asarray(ids), True,
    )
    path = tmp_path / "model.ckpt"
    report = save_torch_checkpoint(variables, t_head.state_dict(), str(path))
    assert report == []

    # the reference driver's exact load (train_clip_final.py:443-449)
    t_head.load_state_dict(torch.load(str(path)), strict=True)
    t_head.eval()
    with torch.no_grad():
        ref_ce, ref_avg, ref_total = t_head(
            torch.from_numpy(eeg), torch.from_numpy(speech),
            torch.from_numpy(ids),
        )
    (ce, avg, total), _ = j_head.apply(
        variables, jnp.asarray(eeg), jnp.asarray(speech), jnp.asarray(ids),
        True, mutable=["membank"],
    )
    np.testing.assert_allclose(float(ce), ref_ce.item(), atol=1e-4)
    np.testing.assert_allclose(float(avg), ref_avg.item(), atol=5e-4)
    np.testing.assert_allclose(float(total), ref_total.item(), atol=5e-4)


def test_export_cli_from_run_dir(rng, tmp_path):
    """`python -m ...utils.torch_export --run <dir> --template <ckpt>` turns
    a training run's orbax checkpoint into a reference model.ckpt."""
    from transformer_clip_eeg_tpu.train.checkpoint import (
        CKPT_NAME,
        save_params_only,
    )
    from transformer_clip_eeg_tpu.utils import torch_export

    t_head, j_head = _flagship_pair()
    eeg = rng.standard_normal((2, WL, 64)).astype(np.float32)
    speech = rng.standard_normal((2, WL, 40)).astype(np.float32)
    ids = np.arange(2).astype(np.int64)
    variables = j_head.init(
        {"params": jax.random.PRNGKey(5), "membank": jax.random.PRNGKey(6)},
        jnp.asarray(eeg), jnp.asarray(speech), jnp.asarray(ids), True,
    )
    run_dir = tmp_path / "run"
    (run_dir / "checkpoints").mkdir(parents=True)
    save_params_only(
        str(run_dir / "checkpoints" / CKPT_NAME),
        {"step": 0, "params": variables["params"],
         "membank": variables["membank"], "batch_stats": {},
         "opt_state": {}},
    )
    template_path = tmp_path / "template.ckpt"
    torch.save(t_head.state_dict(), str(template_path))
    out_path = tmp_path / "exported.ckpt"

    rc = torch_export.main([
        "--run", str(run_dir), "--template", str(template_path),
        "--out", str(out_path),
    ])
    assert rc == 0
    t_head.load_state_dict(torch.load(str(out_path)), strict=True)
    # exported params really are the run's params, not the template's
    np.testing.assert_allclose(
        t_head.temperature.detach().numpy(),
        np.asarray(variables["params"]["temperature"]),
    )
