"""Export flax variable trees as reference-layout torch ``state_dict``s.

The inverse of :mod:`transformer_clip_eeg_tpu.utils.torch_import`: a model
trained by this framework can be handed back to the reference code
(``train_clip_final.py:443-449,541-556`` consumes a bare ``state_dict``
written by ``torch.save``), completing the checkpoint-interop story in both
directions.

The conversion is *template-driven*: the caller supplies the target
``state_dict`` key/shape layout (from ``torch_model.state_dict()``, or any
reference ``model.ckpt`` loaded from disk), and each torch key is resolved
to its flax leaf with the exact same key-grammar machinery the import path
uses (``_rewrite_comps`` / ``_resolve_path``); only the per-leaf layout
transform is inverted:

* ``kernel`` [I, O]         → ``weight`` [O, I]           (nn.Linear)
* ``kernel`` [K, I, O]      → ``weight`` [O, I, K]        (nn.Conv1d)
* ``kernel`` [kT, 1, F]     → ``weight`` [F, 1, kT, 1]    (valid-time Conv2d)
* ``scale``/``bias`` [T, C] → 2-D LayerNorm([C, T]) weight/bias
* ``kernel_ih`` [I, 4H]     → ``weight_ih_l0`` [4H, I]    (nn.LSTM, ±reverse)
* params + batch_stats      → BatchNorm weight/bias/running_mean/running_var
* ``membank`` collection    → reference ``memoryBank.memory`` buffer

Template leaves with no flax counterpart (e.g. BatchNorm's
``num_batches_tracked``, which has no analogue in our functional state) keep
their template values and are listed in the returned report.

Torch is imported lazily; the tensors returned are plain numpy arrays unless
:func:`save_torch_checkpoint` is used, which materializes real torch tensors
so the file round-trips through ``torch.load`` + ``load_state_dict``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import numpy as np

from transformer_clip_eeg_tpu.utils.torch_import import (
    _resolve_node,
    _resolve_path,
    _rewrite_comps,
)

_LSTM_LEAVES = (
    ("weight_ih_l0", "kernel_ih"),
    ("weight_hh_l0", "kernel_hh"),
    ("bias_ih_l0", "bias_ih"),
    ("bias_hh_l0", "bias_hh"),
    ("weight_ih_l0_reverse", "kernel_ih_reverse"),
    ("weight_hh_l0_reverse", "kernel_hh_reverse"),
    ("bias_ih_l0_reverse", "bias_ih_reverse"),
    ("bias_hh_l0_reverse", "bias_hh_reverse"),
)


def _shape(t) -> Tuple[int, ...]:
    return tuple(t.shape)


def _tree_get(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _emit_torch_group(
    out: Dict[str, np.ndarray],
    prefix: Tuple[str, ...],
    leaves: Dict[str, Any],
    node: Any,
    path: Tuple[str, ...],
    batch_stats: Dict[str, Any],
    report: List[str],
) -> None:
    """Fill ``out`` with one torch module's leaves from the flax subtree.

    ``leaves`` maps leaf name → the *template* tensor (shape/dtype cues);
    ``node`` is the resolved flax params subtree (or a bare leaf for
    embedding tables like the KLD ``mu_eeg_lookup``).
    """
    key = lambda name: ".".join(prefix + (name,))

    def keep(name):
        out[key(name)] = np.asarray(leaves[name])
        report.append(key(name))

    if "weight_ih_l0" in leaves:  # nn.LSTM
        for tk, fk in _LSTM_LEAVES:
            if tk in leaves:
                v = np.asarray(node[fk])
                out[key(tk)] = v.T if v.ndim == 2 else v
        return
    if "running_mean" in leaves:  # nn.BatchNorm1d
        stats = _tree_get(batch_stats, path)
        out[key("weight")] = np.asarray(node["scale"])
        out[key("bias")] = np.asarray(node["bias"])
        out[key("running_mean")] = np.asarray(stats["mean"])
        out[key("running_var")] = np.asarray(stats["var"])
        if "num_batches_tracked" in leaves:
            # our functional state has no analogue; torch only consults it
            # when BatchNorm(momentum=None), which the reference never uses
            keep("num_batches_tracked")
        return
    w_t = leaves.get("weight")
    if w_t is None:
        for name in leaves:
            keep(name)
        return
    if not isinstance(node, dict):  # bare embedding table — no transpose
        out[key("weight")] = np.asarray(node)
        return
    b_t = leaves.get("bias")
    ndim = len(_shape(w_t))
    if ndim == 4:  # valid-time Conv2d: kernel [kT, 1, F] → [F, 1, kT, 1]
        k = np.asarray(node["kernel"])
        out[key("weight")] = k[:, 0, :].T[:, None, :, None]
    elif ndim == 3:  # Conv1d: kernel [K, I, O] → [O, I, K]
        out[key("weight")] = np.asarray(node["kernel"]).transpose(2, 1, 0)
    elif ndim == 2 and b_t is not None and len(_shape(b_t)) == 2:
        # 2-D LayerNorm([C, T]): LayerNormTC scale/bias [T, C] → [C, T]
        out[key("weight")] = np.asarray(node["scale"]).T
        out[key("bias")] = np.asarray(node["bias"]).T
        return
    elif ndim == 2:  # nn.Linear: kernel [I, O] → [O, I]
        out[key("weight")] = np.asarray(node["kernel"]).T
    else:  # 1-D LayerNorm
        out[key("weight")] = np.asarray(node["scale"])
        if b_t is not None:
            out[key("bias")] = np.asarray(node["bias"])
        return
    if b_t is not None:
        out[key("bias")] = np.asarray(node["bias"])


def export_state_dict(
    variables: Dict[str, Any], template_state_dict: Dict[str, Any]
) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """flax variables → torch-layout ``state_dict`` (numpy values).

    ``template_state_dict`` supplies the key names and per-leaf shapes of
    the target layout — typically ``reference_model.state_dict()``.
    Returns ``(state_dict, report)``; ``report`` lists keys that kept their
    template values because the flax tree has no counterpart.
    """
    params_t = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})
    membank = variables.get("membank", {})
    out: Dict[str, np.ndarray] = {}
    report: List[str] = []

    groups: Dict[Tuple[str, ...], Dict[str, Any]] = {}
    for k, t in template_state_dict.items():
        comps = k.split(".")
        arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        groups.setdefault(tuple(comps[:-1]), {})[comps[-1]] = arr

    for prefix, leaves in groups.items():
        if not prefix:  # root scalars: temperature, temperature_eeg
            for name, v in leaves.items():
                if name in params_t:
                    out[name] = np.asarray(params_t[name])
                else:
                    out[name] = np.asarray(v)
                    report.append(name)
            continue
        if "memory" in leaves:  # reference memoryBank buffer
            mem = _tree_get(membank, prefix + ("memory",))
            if mem is not None:
                out[".".join(prefix + ("memory",))] = np.asarray(mem)
            else:
                out[".".join(prefix + ("memory",))] = np.asarray(leaves["memory"])
                report.append(".".join(prefix + ("memory",)))
            continue
        comps = _rewrite_comps(list(prefix))
        node = _resolve_node(params_t, comps)
        path = _resolve_path(params_t, comps)
        if node is None or path is None:
            for name, v in leaves.items():
                out[".".join(prefix + (name,))] = np.asarray(v)
                report.append(".".join(prefix + (name,)))
            continue
        _emit_torch_group(out, prefix, leaves, node, path, batch_stats, report)
    return out, report


def save_torch_checkpoint(
    variables: Dict[str, Any],
    template_state_dict: Dict[str, Any],
    path: str | os.PathLike,
) -> List[str]:
    """Write a reference-loadable ``model.ckpt`` from flax variables.

    The produced file round-trips through the reference driver's
    ``torch.load`` + ``load_state_dict`` (ref ``train_clip_final.py:
    443-449``).  Returns the kept-template-value report.
    """
    import torch

    sd_np, report = export_state_dict(variables, template_state_dict)
    sd = {}
    for k, v in sd_np.items():
        t = template_state_dict.get(k)
        dtype = t.dtype if hasattr(t, "dtype") and hasattr(t, "detach") else None
        # copy: np.asarray over a JAX buffer yields a non-writable view that
        # torch would otherwise alias
        sd[k] = torch.as_tensor(np.array(v, copy=True), dtype=dtype)
    torch.save(sd, os.fspath(path))
    return report


def main(argv=None) -> int:
    """CLI: a training run dir → a reference-loadable ``model.ckpt``.

    The template — any reference-written ``model.ckpt`` for the same
    architecture (e.g. the published checkpoints, or one saved by
    ``train_clip_final.py:531-540``) — supplies the torch key layout; no
    reference code is imported.
    """
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m transformer_clip_eeg_tpu.utils.torch_export",
        description=main.__doc__,
    )
    ap.add_argument(
        "--run", required=True,
        help="results dir of a training run (contains checkpoints/model_ckpt)",
    )
    ap.add_argument(
        "--template", required=True,
        help="reference model.ckpt whose key/shape layout to produce",
    )
    ap.add_argument("--out", required=True, help="output model.ckpt path")
    args = ap.parse_args(argv)

    import torch

    from transformer_clip_eeg_tpu.train.checkpoint import (
        CKPT_NAME,
        restore_params_only,
    )

    ckpt_path = os.path.join(args.run, "checkpoints", CKPT_NAME)
    if not os.path.exists(ckpt_path):
        ap.error(f"no checkpoint at {ckpt_path}")
    payload = restore_params_only(ckpt_path)
    variables = {
        coll: payload[coll]
        for coll in ("params", "membank", "batch_stats")
        if payload.get(coll)
    }
    template = torch.load(args.template, map_location="cpu")
    report = save_torch_checkpoint(variables, template, args.out)
    for item in report:
        print(f"kept template value: {item}")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":  # pragma: no cover - exercised via main() in tests
    raise SystemExit(main())
