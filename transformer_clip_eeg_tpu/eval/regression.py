"""Envelope-regression evaluation suite.

Working equivalents of the reference's three regression procedures
(ref ``train_clip_helper_functions.py:443-764`` sub-specific, ``:767-1103``
sub-independent, ``:208-380`` ICASSP-2023 challenge).  Note the reference's
in-repo loader never yields the 5-tuples those functions expect — every batch
is skipped at ``:508-519`` — so this module implements the *intended*
semantics (documented in SURVEY §2.5) on the working
``EEGWindowDataset.iter_subject_windows`` iterator:

* frozen EEG-encoder embeddings over non-overlapping windows, with
  nearest-neighbor time-upsampling + last-value extrapolation / crop when the
  encoder strides (ref ``:535-547``),
* a Conv1d(k=32) probe trained with negative-Pearson loss, Adam lr 1e-3,
  250 epochs, patience 10, batch 64 (ref ``:623-672``), best-on-val
  checkpointing,
* challenge eval: 50%-overlap windows, probe prediction, Hann-window
  overlap-add reconstruction with boundary correction, Pearson vs ground
  truth (ref ``:262,306-325,360``).

TPU-first: probe training steps are jitted (the probe is one small conv —
each epoch is a handful of fused XLA launches), embeddings are extracted with
the jitted encoder in fixed-size chunks, and the overlap-add is a vectorized
scatter-add rather than a per-window loop.
"""

from __future__ import annotations

import functools
import glob
import json
import os
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset
from transformer_clip_eeg_tpu.eval.labels import load_labels_regression_2023
from transformer_clip_eeg_tpu.eval.match_mismatch import embed_in_chunks
from transformer_clip_eeg_tpu.models.regression import RegressionModel, pearson_loss
from transformer_clip_eeg_tpu.train.checkpoint import (
    restore_params_only,
    save_params_only,
)
from transformer_clip_eeg_tpu.train.loop import printf


def _subject_of(path: str) -> str:
    return os.path.basename(path).split("_")[0]


def _story_of(path: str) -> str:
    return os.path.basename(path).split("-audio-")[-1].split("_eeg")[0]


def _audio_story(path: str) -> str:
    return os.path.basename(path).split("_-_")[0]


def _env_audio_files(audio_files: Sequence[str], regress_to: str) -> List[str]:
    """The driver passes audio lists globbed for the *training* stimulus
    feature (e.g. wav2vec_19), but regression targets ``regress_to`` (env).
    Discover the target-feature files for the same stories from the same
    stimulus directories."""
    stories = {_audio_story(x) for x in audio_files}
    dirs = {os.path.dirname(x) for x in audio_files}
    out = []
    for d in dirs:
        for f in glob.glob(os.path.join(d, f"*_-_{regress_to}.npy")):
            if _audio_story(f) in stories:
                out.append(f)
    return sorted(out)


def match_time_length(embeddings: np.ndarray, target_len: int) -> np.ndarray:
    """Stride compensation (ref :535-547): nearest-neighbor upsample by the
    integer stride, then extrapolate the last value / crop to ``target_len``.

    ``embeddings`` is ``[B, T, D]``."""
    t = embeddings.shape[1]
    if t == target_len:
        return embeddings
    stride = int(target_len / t)
    if stride > 1:
        embeddings = np.repeat(embeddings, stride, axis=1)
    t = embeddings.shape[1]
    if t < target_len:
        pad = np.repeat(embeddings[:, -1:, :], target_len - t, axis=1)
        embeddings = np.concatenate([embeddings, pad], axis=1)
    elif t > target_len:
        embeddings = embeddings[:, :target_len, :]
    return embeddings


def extract_subject_embeddings(
    model,
    variables,
    files: Sequence[str],
    audio_files: Sequence[str],
    window_length: int,
    regress_to: str = "env",
    batch_size: int = 128,
    mesh=None,
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Per subject: frozen EEG embeddings + aligned target feature.

    Returns {subject: (embeddings [N, T, D], target [N, T, 1])}.
    ``mesh``: optional device mesh — extraction shards each chunk over the
    'data' axis (identical outputs; see ``mesh_embed_setup``)."""
    from transformer_clip_eeg_tpu.eval.match_mismatch import mesh_embed_setup
    from transformer_clip_eeg_tpu.train.steps import make_encode_fn

    if mesh is not None:
        shardings, variables = mesh_embed_setup(variables, mesh)
        encode_eeg = make_encode_fn(model, in_shardings=shardings)
    else:
        encode_eeg = make_encode_fn(model)
    env_files = _env_audio_files(audio_files, regress_to)
    dataset = EEGWindowDataset(
        list(files), env_files, window_length, window_length,
        batch_size=batch_size,
    )
    per_subject: Dict[str, List] = {}
    for sub, key, eeg, feats in dataset.iter_subject_windows():
        if regress_to not in feats:
            continue
        env = feats[regress_to]
        if env.ndim == 4:  # ref :568-570 prune trailing singleton
            env = env[:, :, :, 0]
        emb = embed_in_chunks(encode_eeg, variables, eeg.astype(np.float32))
        env = env[: emb.shape[0]]
        emb = match_time_length(emb, env.shape[1])
        per_subject.setdefault(sub, []).append((emb, env.astype(np.float32)))
    return {
        sub: (
            np.concatenate([e for e, _ in pairs], axis=0),
            np.concatenate([v for _, v in pairs], axis=0),
        )
        for sub, pairs in per_subject.items()
    }


def _cached_extract(
    cache: Optional[dict],
    model,
    variables,
    files,
    audio_files,
    wl: int,
    regress_to: str,
    batch_size: int,
    mesh,
):
    """``extract_subject_embeddings`` behind an optional caller-owned cache.

    The sub-specific and sub-independent evals each ingest the SAME
    train/val/test corpus from disk and re-embed it (the reference does
    too — its per-block structure at ref ``train_clip_final.py:558-601``
    re-instantiates ``EEGDatasetSimdata`` six times).  At SparrKULee scale
    that re-ingest dominates eval wall-clock (SCALE.md: ~4,200 s of an
    8,292 s run) while the extracted embeddings are tiny ([N,T,8] vs the
    raw [N,T,64] EEG + [N,T,1024] wav2vec), so the CLI shares one cache
    dict across both blocks.  Keyed on everything that affects the output.
    """
    if cache is None:
        return extract_subject_embeddings(
            model, variables, files, audio_files, wl, regress_to,
            batch_size, mesh=mesh,
        )
    key = (tuple(files), tuple(audio_files), wl, regress_to, batch_size)
    if key not in cache:
        cache[key] = extract_subject_embeddings(
            model, variables, files, audio_files, wl, regress_to,
            batch_size, mesh=mesh,
        )
    return cache[key]


# ---------------------------------------------------------------------------
# Probe training (ref :623-672)
# ---------------------------------------------------------------------------


def release_probe_programs() -> None:
    """Drop the cached probe-trainer programs (and every jitted executable
    they pin) so a long-running eval process can bound its retained heap.

    The two ``lru_cache``'d program builders below keep jitted closures
    alive for the life of the process; each closure's jit cache pins its
    compiled executables and their host-side buffers.  Across many
    eval suites with varying shapes that retention stacks (SCALE.md r4:
    ~58 GB stayed live between suites).  Clearing costs the next suite a
    re-trace/re-compile of the probe programs — seconds against a
    multi-hundred-second suite — and ``jax.clear_caches()`` sweeps any
    other shape-keyed executables (embedding extraction, MM eval) too.
    """
    _sequential_probe_program.cache_clear()
    _batched_probe_program.cache_clear()
    jax.clear_caches()


@functools.lru_cache(maxsize=8)
def _sequential_probe_program(out_dim: int, lr: float):
    """(model, tx, step, val_loss) for the sequential probe trainer, cached
    so repeated per-subject calls hit the jit cache instead of re-tracing
    fresh closures (jit caches by function identity)."""
    import optax

    model = RegressionModel(output_dim=out_dim)
    tx = optax.adam(lr)

    @jax.jit
    def step(params, opt_state, emb, env):
        def loss_fn(p):
            out = model.apply(p, emb)
            return jnp.mean(pearson_loss(out, env, axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def val_loss_fn(params, emb, env):
        out = model.apply(params, emb)
        return jnp.mean(pearson_loss(out, env, axis=1))

    return model, tx, step, val_loss_fn


def train_regression_probe(
    train_emb: np.ndarray,
    train_env: np.ndarray,
    val_emb: np.ndarray,
    val_env: np.ndarray,
    *,
    epochs: int = 250,
    patience: int = 10,
    batch_size: int = 64,
    lr: float = 1e-3,
    loss_file: Optional[str] = None,
    seed: int = 0,
):
    """Train the Conv1d probe; returns (params, best_val_loss).

    Exact reference procedure (ref :623-672): Adam lr 1e-3, negative-Pearson
    loss, minibatches of 64 in order, best-on-val checkpoint, early stop
    after ``patience`` non-improving epochs.
    """
    model, tx, step, val_loss_fn = _sequential_probe_program(
        train_env.shape[-1], lr
    )
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(train_emb[:1]))
    opt_state = tx.init(params)

    n = train_emb.shape[0]
    best_val = np.inf
    best_epoch = 0
    best_params = params
    for epoch in range(epochs):
        train_losses = []
        for i in range(0, n, batch_size):
            params, opt_state, loss = step(
                params, opt_state, train_emb[i : i + batch_size],
                train_env[i : i + batch_size],
            )
            train_losses.append(float(loss))
        val_losses = [
            float(val_loss_fn(params, val_emb[i : i + batch_size],
                              val_env[i : i + batch_size]))
            for i in range(0, val_emb.shape[0], batch_size)
        ]
        val_loss = float(np.mean(val_losses))
        if loss_file:
            printf(
                f"epoch {epoch}, loss {np.mean(train_losses)}, "
                f"val_loss {val_loss}",
                loss_file,
            )
        if val_loss < best_val:
            best_val = val_loss
            best_epoch = epoch
            best_params = params
        elif epoch - best_epoch > patience:
            params = best_params
            break
    return best_params, best_val


@functools.lru_cache(maxsize=8)
def _batched_probe_program(
    S: int,
    out_dim: int,
    n_tr_batches: int,
    n_va_batches: int,
    epochs: int,
    patience: int,
    batch_size: int,
    lr: float,
):
    """Build (model, tx, train_all) for the batched probe trainer.

    Cached on the static configuration so repeated calls (the eval suite
    trains sub-specific AND sub-independent probes; benchmarks warm then
    time) reuse ONE jitted program instead of re-tracing a fresh closure
    per invocation — ``jax.jit`` caches by function identity, so the jit
    must wrap a process-lifetime closure to ever hit its cache."""
    import optax

    model = RegressionModel(output_dim=out_dim)
    tx = optax.adam(lr)

    def batch_pearson(p, emb_b, env_b, row_mask):
        # masked per-batch scalar: mean over valid rows, then channels —
        # identical to ``jnp.mean(pearson_loss(...))`` on the unpadded batch
        out = model.apply(p, emb_b)
        # padded rows are constant over time → zero variance → NaN grads
        # through x/||x|| (0-cotangent · inf); swap in a harmless ramp
        # (the rows are masked out of the loss, so values/grads of real
        # rows are untouched)
        ramp = jnp.arange(out.shape[1], dtype=out.dtype)[None, :, None]
        out = jnp.where(row_mask[:, None, None] > 0, out, ramp)
        xc = out - jnp.mean(out, axis=1, keepdims=True)
        yc = env_b - jnp.mean(env_b, axis=1, keepdims=True)
        num = jnp.sum(xc * yc, axis=1)
        den = jnp.maximum(jnp.linalg.norm(xc, axis=1), 1e-6) * jnp.maximum(
            jnp.linalg.norm(yc, axis=1), 1e-6
        )
        r = num / den  # [bs, C]
        cnt = jnp.sum(row_mask)
        return -jnp.sum(r * row_mask[:, None]) / jnp.maximum(
            cnt * r.shape[1], 1.0
        )

    def subject_epoch(params, opt_state, emb, env, n, done):
        def mb(carry, b):
            p, o = carry
            start = b * batch_size
            emb_b = jax.lax.dynamic_slice_in_dim(emb, start, batch_size, 0)
            env_b = jax.lax.dynamic_slice_in_dim(env, start, batch_size, 0)
            row_mask = (
                start + jnp.arange(batch_size) < n
            ).astype(jnp.float32)
            valid = jnp.logical_and(start < n, jnp.logical_not(done))
            loss, grads = jax.value_and_grad(batch_pearson)(
                p, emb_b, env_b, row_mask
            )
            updates, o_new = tx.update(grads, o)
            p_new = optax.apply_updates(p, updates)
            p = jax.tree.map(lambda a, b_: jnp.where(valid, a, b_), p_new, p)
            o = jax.tree.map(lambda a, b_: jnp.where(valid, a, b_), o_new, o)
            return (p, o), loss

        (params, opt_state), _ = jax.lax.scan(
            mb, (params, opt_state), jnp.arange(n_tr_batches)
        )
        return params, opt_state

    def subject_val(params, emb, env, n):
        def vb(_, b):
            start = b * batch_size
            emb_b = jax.lax.dynamic_slice_in_dim(emb, start, batch_size, 0)
            env_b = jax.lax.dynamic_slice_in_dim(env, start, batch_size, 0)
            row_mask = (
                start + jnp.arange(batch_size) < n
            ).astype(jnp.float32)
            loss = batch_pearson(params, emb_b, env_b, row_mask)
            return None, (loss, (start < n).astype(jnp.float32))

        _, (losses, valid) = jax.lax.scan(
            vb, None, jnp.arange(n_va_batches)
        )
        # the reference's unweighted mean of per-batch means (np.mean over
        # the val_losses list, ref :196-201)
        return jnp.sum(losses * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    v_epoch = jax.vmap(subject_epoch, in_axes=(0, 0, 0, 0, 0, 0))
    v_val = jax.vmap(subject_val, in_axes=(0, 0, 0, 0))

    # the data tensors MUST be traced arguments, not closure captures — a
    # closed-over jnp array is baked into the jitted program as a constant,
    # making compile time (and executable size) scale with the dataset
    # (~0.5 GB of embeddings at SparrKULee scale)
    @jax.jit
    def train_all(params, opt_state, tr_emb, tr_env, tr_n, va_emb, va_env,
                  va_n):
        best_params = jax.tree.map(jnp.copy, params)
        init = dict(
            params=params,
            opt_state=opt_state,
            best_params=best_params,
            best_val=jnp.full((S,), jnp.inf),
            best_epoch=jnp.zeros((S,), jnp.int32),
            done=jnp.zeros((S,), bool),
            epoch=jnp.zeros((), jnp.int32),
        )

        def cond(c):
            return jnp.logical_and(
                c["epoch"] < epochs, jnp.any(jnp.logical_not(c["done"]))
            )

        def body(c):
            params, opt_state = v_epoch(
                c["params"], c["opt_state"], tr_emb, tr_env, tr_n, c["done"]
            )
            val = v_val(params, va_emb, va_env, va_n)
            live = jnp.logical_not(c["done"])
            improved = jnp.logical_and(val < c["best_val"], live)
            best_params = jax.tree.map(
                lambda b, p: jnp.where(
                    improved.reshape((S,) + (1,) * (p.ndim - 1)), p, b
                ),
                c["best_params"],
                params,
            )
            best_val = jnp.where(improved, val, c["best_val"])
            best_epoch = jnp.where(improved, c["epoch"], c["best_epoch"])
            # ref :208-214: the patience check is the ELIF of the
            # improvement check, against the pre-update best_epoch
            stop = jnp.logical_and(
                jnp.logical_not(improved),
                c["epoch"] - c["best_epoch"] > patience,
            )
            return dict(
                params=params,
                opt_state=opt_state,
                best_params=best_params,
                best_val=best_val,
                best_epoch=best_epoch,
                done=jnp.logical_or(c["done"], jnp.logical_and(stop, live)),
                epoch=c["epoch"] + 1,
            )

        return jax.lax.while_loop(cond, body, init)

    return model, tx, train_all


def train_regression_probes_batched(
    subjects: Sequence[str],
    train_by_sub: Dict[str, Tuple[np.ndarray, np.ndarray]],
    val_by_sub: Dict[str, Tuple[np.ndarray, np.ndarray]],
    *,
    epochs: int = 250,
    patience: int = 10,
    batch_size: int = 64,
    lr: float = 1e-3,
    seed: int = 0,
) -> Dict[str, Tuple[Dict, float]]:
    """Train EVERY subject's probe simultaneously as ONE jitted program.

    The reference trains ~85 per-subject probes sequentially, each a
    250-epoch python loop of tiny minibatch steps (ref :623-672) — hours of
    dispatch-bound work.  Here the per-subject loop is ``vmap``-ed over a
    stacked subject axis and the whole (epochs × minibatches) schedule runs
    inside one ``lax.while_loop``: a single dispatch trains all probes.

    Semantics match :func:`train_regression_probe` exactly per subject
    (verified by ``tests/test_eval_suite.py``): ragged subject lengths are
    end-padded and masked so minibatch boundaries, per-batch loss means, the
    unweighted mean-of-batch-means validation loss, best-on-val tracking, and
    per-subject early stopping (no updates after patience is exceeded) are
    all bit-for-bit the sequential procedure's.

    Memory note: every subject is padded to the longest subject's window
    count (rounded up to ``batch_size``), so the stacked tensors are
    O(S × max_n) — one outlier subject inflates the whole stack.  At
    SparrKULee scale (~85 subjects × ~1.5 h recordings) this is a few
    hundred MB of f32 and well inside HBM; if real length skew ever makes
    it a problem, bucket subjects by length into 2–3 stacked programs.

    Returns ``{subject: (params, best_val_loss)}``.
    """
    S = len(subjects)
    assert S > 0
    out_dim = train_by_sub[subjects[0]][1].shape[-1]

    def stack(by_sub):
        # callers pre-resolve fallbacks: every subject must have an entry
        pairs = [by_sub[s] for s in subjects]
        ns = np.array([p[0].shape[0] for p in pairs], np.int32)
        nmax = int(-(-max(ns) // batch_size) * batch_size)  # pad to multiple
        emb = np.zeros((S, nmax) + pairs[0][0].shape[1:], np.float32)
        env = np.zeros((S, nmax) + pairs[0][1].shape[1:], np.float32)
        for i, (e, v) in enumerate(pairs):
            emb[i, : e.shape[0]] = e
            env[i, : v.shape[0]] = v
        return jnp.asarray(emb), jnp.asarray(env), jnp.asarray(ns)

    tr_emb, tr_env, tr_n = stack(train_by_sub)
    va_emb, va_env, va_n = stack(val_by_sub)
    n_tr_batches = tr_emb.shape[1] // batch_size
    n_va_batches = va_emb.shape[1] // batch_size

    model, tx, train_all = _batched_probe_program(
        S, out_dim, n_tr_batches, n_va_batches, epochs, patience, batch_size,
        lr,
    )
    params0 = model.init(jax.random.PRNGKey(seed), tr_emb[0, :1])
    params = jax.tree.map(
        lambda x: jnp.tile(x, (S,) + (1,) * x.ndim), params0
    )
    opt_state = jax.vmap(tx.init)(params)

    final = train_all(
        params, opt_state, tr_emb, tr_env, tr_n, va_emb, va_env, va_n
    )
    best_params = jax.device_get(final["best_params"])
    best_val = np.asarray(final["best_val"])
    return {
        s: (jax.tree.map(lambda x, _i=i: x[_i], best_params), float(best_val[i]))
        for i, s in enumerate(subjects)
    }


def _probe_test_loss(params, emb: np.ndarray, env: np.ndarray) -> float:
    model = RegressionModel(output_dim=env.shape[-1])
    out = model.apply(params, jnp.asarray(emb))
    return float(jnp.mean(pearson_loss(out, jnp.asarray(env), axis=1)))


# ---------------------------------------------------------------------------
# Sub-specific (ref :443-764)
# ---------------------------------------------------------------------------


def evaluate_model_do_regression_sub_specific(
    model,
    variables,
    train_files,
    val_files,
    test_files,
    train_files_audio,
    val_files_audio,
    test_files_audio,
    result_folder: str,
    regress_to: str = "env",
    window_length: int = 3,
    fs: int = 64,
    batch_size: int = 128,
    mesh=None,
    embeddings_cache: Optional[dict] = None,
) -> Dict[str, float]:
    """Per-subject probes; returns {subject: test negative-Pearson loss}
    and writes ``evaluation_regression.json`` + per-subject probe
    checkpoints under ``sub_specific/`` (ref :443-764).

    ``embeddings_cache``: optional dict shared with the sub-independent
    eval so the corpus is ingested + embedded once, not twice."""
    os.makedirs(os.path.join(result_folder, "sub_specific"), exist_ok=True)
    wl = window_length * fs
    evaluation: Dict[str, float] = {}

    train_by_sub = _cached_extract(
        embeddings_cache, model, variables, train_files, train_files_audio,
        wl, regress_to, batch_size, mesh,
    )
    val_by_sub = _cached_extract(
        embeddings_cache, model, variables, val_files, val_files_audio,
        wl, regress_to, batch_size, mesh,
    )
    test_by_sub = _cached_extract(
        embeddings_cache, model, variables, test_files, test_files_audio,
        wl, regress_to, batch_size, mesh,
    )

    print(f"number of subjects {len(train_by_sub)}")
    subjects = []
    for sub in train_by_sub:
        if sub not in test_by_sub:
            print(f"subject {sub} has no test files")
            continue
        subjects.append(sub)
    if not subjects:
        return evaluation

    # ONE jitted program trains every subject's probe (the reference loops
    # subjects on the host, ref :485-672); val falls back to test when a
    # subject has no val files (ref :489-491)
    resolved_val = {
        sub: val_by_sub.get(sub, test_by_sub[sub]) for sub in subjects
    }
    file_loss = os.path.join(result_folder, "loss_regression.txt")
    try:
        trained = train_regression_probes_batched(
            subjects, train_by_sub, resolved_val
        )
    except Exception as e:  # noqa: BLE001
        # one pathological subject aborts the single fused program — fall
        # back to per-subject training so the rest still get probes, with
        # the reference's per-subject resilience (ref :759-763)
        printf(
            f"batched probe training failed ({type(e).__name__}: {e}); "
            "falling back to sequential per-subject training",
            os.path.join(result_folder, "error_regression.txt"),
        )
        trained = {}
        for sub in subjects:
            try:
                tr_emb, tr_env = train_by_sub[sub]
                va_emb, va_env = resolved_val[sub]
                trained[sub] = train_regression_probe(
                    tr_emb, tr_env, va_emb, va_env, loss_file=file_loss
                )
            except Exception as se:  # noqa: BLE001
                printf(
                    f"error with subject {sub}",
                    os.path.join(result_folder, "error_regression.txt"),
                )
                printf(
                    str(se),
                    os.path.join(result_folder, "error_regression.txt"),
                )
        subjects = [s for s in subjects if s in trained]

    for sub in subjects:
        try:
            print(f"subject {sub}")
            probe_params, _best_val = trained[sub]
            # the reference streams per-epoch probe losses to
            # loss_regression.txt (ref :628-651); the fused program can't
            # stream, so record the per-subject outcome instead
            printf(
                f"subject {sub} probe best val loss {_best_val}", file_loss
            )
            save_params_only(
                os.path.join(
                    result_folder, "sub_specific", f"regression_model_{sub}"
                ),
                probe_params,
            )
            te_emb, te_env = test_by_sub[sub]
            evaluation[sub] = _probe_test_loss(probe_params, te_emb, te_env)
            print(f"evaluation for subject {sub} is {evaluation[sub]}")
            with open(
                os.path.join(result_folder, "evaluation_regression.json"), "w"
            ) as f:
                json.dump(evaluation, f)
        except Exception as e:  # per-subject resilience (ref :759-763)
            printf(
                f"error with subject {sub}",
                os.path.join(result_folder, "error_regression.txt"),
            )
            printf(str(e), os.path.join(result_folder, "error_regression.txt"))
            continue
    return evaluation


# ---------------------------------------------------------------------------
# Sub-independent (ref :767-1103)
# ---------------------------------------------------------------------------


def evaluate_model_do_regression_sub_independent(
    model,
    variables,
    train_files,
    val_files,
    test_files,
    train_files_audio,
    val_files_audio,
    test_files_audio,
    result_folder: str,
    regress_to: str = "env",
    window_length: int = 3,
    fs: int = 64,
    batch_size: int = 128,
    mesh=None,
    embeddings_cache: Optional[dict] = None,
) -> Dict[str, float]:
    """One global probe over all subjects; per-subject test losses →
    ``evaluation_regression_general_model_env.json`` (ref :767-1103).
    Skips training when ``regression_model_general_env`` already exists
    (ref :813).

    ``embeddings_cache``: optional dict shared with the sub-specific
    eval so the corpus is ingested + embedded once, not twice."""
    wl = window_length * fs
    evaluation: Dict[str, float] = {}
    probe_path = os.path.join(result_folder, f"regression_model_general_{regress_to}")

    train_by_sub = _cached_extract(
        embeddings_cache, model, variables, train_files, train_files_audio,
        wl, regress_to, batch_size, mesh,
    )
    val_by_sub = _cached_extract(
        embeddings_cache, model, variables, val_files, val_files_audio,
        wl, regress_to, batch_size, mesh,
    )
    test_by_sub = _cached_extract(
        embeddings_cache, model, variables, test_files, test_files_audio,
        wl, regress_to, batch_size, mesh,
    )
    if not train_by_sub:
        print("no training data for sub-independent regression")
        return evaluation

    tr_emb = np.concatenate([e for e, _ in train_by_sub.values()], axis=0)
    tr_env = np.concatenate([v for _, v in train_by_sub.values()], axis=0)

    if os.path.exists(probe_path):
        probe_params = restore_params_only(probe_path)
        print(f"loaded general probe from {probe_path}")
    else:
        if val_by_sub:
            val_emb = np.concatenate([e for e, _ in val_by_sub.values()], axis=0)
            val_env = np.concatenate([v for _, v in val_by_sub.values()], axis=0)
        else:
            val_emb = np.concatenate([e for e, _ in test_by_sub.values()], axis=0)
            val_env = np.concatenate([v for _, v in test_by_sub.values()], axis=0)
        # same single-dispatch trainer, S=1 (the sequential loop would pay
        # ~n/64 dispatch round-trips per epoch over the device link)
        trained = train_regression_probes_batched(
            ["general"],
            {"general": (tr_emb, tr_env)},
            {"general": (val_emb, val_env)},
        )
        probe_params, best_val = trained["general"]
        printf(
            f"general probe best val loss {best_val}",
            os.path.join(
                result_folder, f"loss_regression_general_{regress_to}.txt"
            ),
        )
        save_params_only(probe_path, probe_params)

    for sub, (te_emb, te_env) in test_by_sub.items():
        evaluation[sub] = _probe_test_loss(probe_params, te_emb, te_env)
        print(f"evaluation for subject {sub} is {evaluation[sub]}")
        with open(
            os.path.join(
                result_folder,
                f"evaluation_regression_general_model_{regress_to}.json",
            ),
            "w",
        ) as f:
            json.dump(evaluation, f)
    return evaluation


# ---------------------------------------------------------------------------
# ICASSP-2023 challenge regression (ref :208-380)
# ---------------------------------------------------------------------------


def hann_overlap_add(
    predictions: np.ndarray, time_window: int, time_dim: int
) -> np.ndarray:
    """Hann-window overlap-add with boundary correction (ref :306-325).

    ``predictions`` is ``[n_windows, time_window]`` from 50%-overlap windows;
    the first half of the first window and the last half of the last window
    get unit weight so the reconstruction is exact at the boundaries.
    Thin host wrapper over the device scatter-add
    (``ops.windowing.overlap_add_hann``)."""
    from transformer_clip_eeg_tpu.ops.windowing import overlap_add_hann

    return np.asarray(
        overlap_add_hann(jnp.asarray(predictions), time_dim, time_window)
    )


@functools.partial(jax.jit, static_argnums=(1, 2))
def _overlap_add_trials(preds, time_dim: int, time_window: int):
    """Per-trial overlap-add in one dispatch: ``[n_trials, n_win, wl]`` →
    ``[n_trials, time_dim]`` (vmapped ``ops.windowing.overlap_add_hann``)."""
    from transformer_clip_eeg_tpu.ops.windowing import overlap_add_hann

    return jax.vmap(lambda p: overlap_add_hann(p, time_dim, time_window))(
        preds
    )


def _pearson_np(x: np.ndarray, y: np.ndarray) -> float:
    xc = x - x.mean()
    yc = y - y.mean()
    return float((xc @ yc) / (np.linalg.norm(xc) * np.linalg.norm(yc) + 1e-12))


def evaluate_model_challenge_2023_regression(
    model,
    variables,
    results_folder: str,
    eeg_folder: str,
    subject: Optional[str] = None,
    mesh=None,
) -> Tuple[Dict, Dict]:
    """ICASSP task-2: probe-predict the envelope per 50%-overlap window,
    reconstruct via Hann overlap-add, Pearson vs ground truth (ref :208-380).

    Returns ({subject: mean r (general probe)}, {subject: mean r
    (sub-specific probe, where present)}) and dumps per-subject prediction
    JSONs under ``regression_2023_icassp/``."""
    from transformer_clip_eeg_tpu.eval.match_mismatch import mesh_embed_setup
    from transformer_clip_eeg_tpu.train.steps import make_encode_fn

    if mesh is not None:
        shardings, variables = mesh_embed_setup(variables, mesh)
        encode_eeg = make_encode_fn(model, in_shardings=shardings)
    else:
        encode_eeg = make_encode_fn(model)
    labels_regression = load_labels_regression_2023(
        os.path.join(eeg_folder, "labels"), subject=subject
    )
    if not labels_regression:
        print("No labels found for regression evaluation, skipping.")
        return {}, {}

    time_dim = len(list(labels_regression.values())[0][0])
    time_window = int(model.window_length)

    # general probe is required (ref :225-231); sub-specific optional.
    # (the reference hardcodes input dim 8 at :229 — here the conv shape is
    # read from the checkpoint itself, so any latent dim works)
    general_probe_path = os.path.join(results_folder, "regression_model_general_env")
    probe_model = RegressionModel(output_dim=1)
    general_params = restore_params_only(general_probe_path)

    evaluation: Dict[str, float] = {}
    evaluation_sub_specific: Dict[str, float] = {}

    if subject is not None:
        test_eeg_mapping = [os.path.join(eeg_folder, f"{subject}.json")]
    else:
        test_eeg_mapping = glob.glob(os.path.join(eeg_folder, "sub*.json"))

    os.makedirs(
        os.path.join(results_folder, "regression_2023_icassp"), exist_ok=True
    )

    for sub_data_path in test_eeg_mapping:
        subject_name = os.path.basename(sub_data_path).split(".")[0]
        sub_probe_path = os.path.join(
            results_folder, "sub_specific", f"regression_model_{subject_name}"
        )
        print(f"evaluating {subject_name}")
        try:
            with open(sub_data_path) as f:
                sub_data = json.load(f)
        except Exception:
            print(f"error with {sub_data_path}")
            continue
        id_list = list(sub_data.keys())
        data_eeg = np.squeeze(
            np.stack([sub_data[key] for key in id_list])
        ).astype(np.float32)
        if data_eeg.ndim == 2:
            data_eeg = data_eeg[None]
        # trial-layout contract (ref :255-261): trials × time × channels,
        # MVN over (trial, time) — the on-device eval normalization op
        from transformer_clip_eeg_tpu.ops.windowing import mvn_normalize

        data_eeg_mvn = np.asarray(jax.jit(mvn_normalize)(data_eeg))

        # 50%-overlap windows, drop ragged last (ref :262)
        hop = time_window // 2
        windows = np.stack(
            [
                data_eeg_mvn[:, i : i + time_window]
                for i in range(0, data_eeg_mvn.shape[1], hop)
            ][:-1]
        )  # [n_windows, n_trials, wl, C]
        windows = np.transpose(windows, (1, 0, 2, 3))  # [n_trials, n_win, wl, C]

        sub_probe_params = None
        if os.path.exists(sub_probe_path):
            sub_probe_params = restore_params_only(sub_probe_path)

        # all trials batched through one embed/predict/overlap-add pipeline
        # (the reference loops trials on the host, ref :265-305)
        nt, nw = windows.shape[0], windows.shape[1]
        flat = windows.reshape((nt * nw,) + windows.shape[2:])
        emb = embed_in_chunks(encode_eeg, variables, flat)
        emb = match_time_length(emb, time_window)
        emb = jnp.asarray(emb)

        def reconstruct(params):
            pred = probe_model.apply(params, emb)  # [nt*nw, wl, 1]
            pred = jnp.squeeze(pred, -1).reshape(nt, nw, time_window)
            return np.asarray(
                _overlap_add_trials(pred, time_dim, time_window)
            )

        final_outputs = list(reconstruct(general_params))
        final_outputs_sub = (
            list(reconstruct(sub_probe_params))
            if sub_probe_params is not None
            else []
        )

        labels_in_order = [labels_regression[x] for x in id_list]
        pearson_corr = [
            _pearson_np(
                final_outputs[i], np.squeeze(np.array(labels_in_order[i][0]))
            )
            for i in range(len(labels_in_order))
        ]
        evaluation[subject_name] = float(np.mean(pearson_corr))
        print(f"evaluation regression: {evaluation[subject_name]}, {subject_name}")
        with open(
            os.path.join(
                results_folder,
                "regression_2023_icassp",
                f"{subject_name}_predictions.json",
            ),
            "w",
        ) as f:
            json.dump(
                {key: final_outputs[i].tolist() for i, key in enumerate(id_list)},
                f,
            )

        if sub_probe_params is not None:
            pearson_sub = [
                _pearson_np(
                    final_outputs_sub[i],
                    np.squeeze(np.array(labels_in_order[i][0])),
                )
                for i in range(len(labels_in_order))
            ]
            evaluation_sub_specific[subject_name] = float(np.mean(pearson_sub))
            with open(
                os.path.join(
                    results_folder,
                    "regression_2023_icassp",
                    f"{subject_name}_predictions_sub_specific.json",
                ),
                "w",
            ) as f:
                json.dump(
                    {
                        key: final_outputs_sub[i].tolist()
                        for i, key in enumerate(id_list)
                    },
                    f,
                )

    return evaluation, evaluation_sub_specific
