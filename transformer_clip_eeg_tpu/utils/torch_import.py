"""Convert reference PyTorch modules / checkpoints into flax variable trees.

This fulfils the "checkpoint-loadable weights" parity requirement: a torch
``state_dict`` saved by the reference driver (``train_clip_final.py:531-540``)
loads losslessly into the TPU framework's models.

The conversion walks the torch module tree and dispatches on module class
name, emitting the flax parameter layout used by this package:

* ``nn.Linear``   weight [O, I]     → ``kernel`` [I, O]
* ``nn.Conv1d``   weight [O, I, K]  → ``kernel`` [K, I, O]
* reference 2-D ``nn.LayerNorm([C, T])`` → ``LayerNormTC`` scale/bias [T, C]
* ``nn.LSTM``     weight_ih_l0 [4H, I] → ``kernel_ih`` [I, 4H] (+ _reverse)
* ``nn.BatchNorm1d`` → params (scale/bias) + batch_stats (mean/var)
* reference ``memoryBank.memory`` buffer → ``membank`` collection

Torch is imported lazily so the package has no torch dependency on the TPU
hot path.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    # .copy() is load-bearing: tensor.numpy() returns a view that shares
    # memory with the torch tensor, and jnp.asarray can be zero-copy on CPU —
    # without the copy, torch in-place ops (e.g. the reference memory bank's
    # index_copy_) would silently mutate the converted JAX arrays.
    return t.detach().cpu().numpy().copy()


class _Collector:
    """Accumulates (collection, path) → array entries into nested dicts."""

    def __init__(self):
        self.trees: Dict[str, Dict] = {}

    def add(self, collection: str, path: Tuple[str, ...], value: np.ndarray):
        node = self.trees.setdefault(collection, {})
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def variables(self) -> Dict[str, Any]:
        return self.trees


def _convert_linear(mod, col: _Collector, path):
    col.add("params", path + ("kernel",), _np(mod.weight).T)
    if mod.bias is not None:
        col.add("params", path + ("bias",), _np(mod.bias))


def _convert_conv1d(mod, col: _Collector, path):
    col.add("params", path + ("kernel",), _np(mod.weight).transpose(2, 1, 0))
    if mod.bias is not None:
        col.add("params", path + ("bias",), _np(mod.bias))


def _convert_layernorm(mod, col: _Collector, path):
    w, b = _np(mod.weight), _np(mod.bias)
    if w.ndim == 2:  # reference LayerNorm([C, T]) → LayerNormTC [T, C]
        w, b = w.T, b.T
    col.add("params", path + ("scale",), w)
    col.add("params", path + ("bias",), b)


def _convert_batchnorm(mod, col: _Collector, path):
    col.add("params", path + ("scale",), _np(mod.weight))
    col.add("params", path + ("bias",), _np(mod.bias))
    col.add("batch_stats", path + ("mean",), _np(mod.running_mean))
    col.add("batch_stats", path + ("var",), _np(mod.running_var))


def _convert_lstm(mod, col: _Collector, path):
    col.add("params", path + ("kernel_ih",), _np(mod.weight_ih_l0).T)
    col.add("params", path + ("kernel_hh",), _np(mod.weight_hh_l0).T)
    col.add("params", path + ("bias_ih",), _np(mod.bias_ih_l0))
    col.add("params", path + ("bias_hh",), _np(mod.bias_hh_l0))
    if getattr(mod, "bidirectional", False):
        col.add("params", path + ("kernel_ih_reverse",), _np(mod.weight_ih_l0_reverse).T)
        col.add("params", path + ("kernel_hh_reverse",), _np(mod.weight_hh_l0_reverse).T)
        col.add("params", path + ("bias_ih_reverse",), _np(mod.bias_ih_l0_reverse))
        col.add("params", path + ("bias_hh_reverse",), _np(mod.bias_hh_l0_reverse))


def _convert_conv2d_valid_time(mod, col: _Collector, path):
    """Reference Conv2d(1, F, (kT, 1)) → Conv2dValidTime kernel [kT, 1, F]."""
    w = _np(mod.weight)  # [F, 1, kT, 1]
    col.add("params", path + ("kernel",), w[:, 0, :, 0].T[:, None, :])
    col.add("params", path + ("bias",), _np(mod.bias))


def _convert_mha(mod, col: _Collector, path):
    for name in ("queries", "keys", "values", "projection"):
        _convert_linear(getattr(mod, name), col, path + (name,))


def _convert_transformer_block(mod, col: _Collector, path):
    """Reference TransformerEncoderBlock: Sequential of two ResidualAdd."""
    ln1, mha = mod[0].fn[0], mod[0].fn[1]
    ln2, ffn = mod[1].fn[0], mod[1].fn[1]
    _convert_layernorm(ln1, col, path + ("ln1",))
    _convert_mha(mha, col, path + ("attn",))
    _convert_layernorm(ln2, col, path + ("ln2",))
    _convert_linear(ffn[0], col, path + ("ffn", "fc1"))
    _convert_linear(ffn[3], col, path + ("ffn", "fc2"))


def _convert_transformer_encoder(mod, col: _Collector, path):
    for i, block in enumerate(mod):
        _convert_transformer_block(block, col, path + (f"block_{i}",))


def _convert_basic_block(mod, col: _Collector, path):
    _convert_conv1d(mod.conv, col, path + ("conv",))
    _convert_layernorm(mod.normalization, col, path + ("normalization",))


def _convert_sequential_conv_act(mod, col: _Collector, path):
    """Reference ``nn.Sequential(conv, activation)`` → bare conv params."""
    first = mod[0]
    if first.weight.ndim == 4:
        _convert_conv2d_valid_time(first, col, path)
    else:
        _convert_conv1d(first, col, path)


_ENCODER_CHILD_DISPATCH = {
    "Linear": _convert_linear,
    "Conv1d": _convert_conv1d,
    "LayerNorm": _convert_layernorm,
    "BatchNorm1d": _convert_batchnorm,
    "LSTM": _convert_lstm,
    "BasicBlock": _convert_basic_block,
    "TransformerEncoder": _convert_transformer_encoder,
    "MultiHeadAttention": _convert_mha,
}


def _convert_generic(mod, col: _Collector, path):
    """Walk direct children, dispatching on class name."""
    for name, child in mod.named_children():
        cls = type(child).__name__
        cpath = path + (name,)
        if cls in _ENCODER_CHILD_DISPATCH:
            _ENCODER_CHILD_DISPATCH[cls](child, col, cpath)
        elif cls == "Sequential":
            # the reference wraps single layers as Sequential(layer, activation)
            first = next(iter(child.children()), None)
            if first is not None and type(first).__name__ in ("Conv1d", "Conv2d"):
                _convert_sequential_conv_act(child, col, cpath)
            elif first is not None and type(first).__name__ == "Linear":
                _convert_linear(first, col, cpath)
            else:
                _convert_generic(child, col, cpath)
        elif cls in ("Dropout", "LeakyReLU", "ReLU", "GELU", "ELU", "Tanh", "Identity"):
            continue
        else:
            _convert_generic(child, col, cpath)


# --------------------------------------------------------------------------
# Encoder-specific entry points (handle name remaps vs the generic walk)
# --------------------------------------------------------------------------


def convert_encoder(torch_encoder) -> Dict[str, Any]:
    """Convert a reference encoder module to flax variables.

    Works for: EEGConformerInterleaved, EEGConformer, EEGConvLSTM,
    EEGConvLSTMNew, EEGModel, EEGExtended, EEGLstm, MelModel,
    Wav2vecSmallModel, SpeechSmallConv (names already aligned 1:1), and
    VLAAI (structural remap below).
    """
    cls = type(torch_encoder).__name__
    col = _Collector()
    if cls == "VLAAI":
        _convert_vlaai(torch_encoder, col, ())
    else:
        _convert_generic(torch_encoder, col, ())
    return col.variables()


def _convert_vlaai(mod, col: _Collector, path):
    _convert_conv1d(mod.eeg, col, path + ("eeg",))
    extractor, recomb, outctx = (
        mod.sequentialConvStack[0],
        mod.sequentialConvStack[1],
        mod.sequentialConvStack[2],
    )
    _convert_conv1d(extractor.eeg, col, path + ("extractor", "eeg"))
    conv_i = norm_i = 0
    for layer in extractor.conv_layers:
        lcls = type(layer).__name__
        if lcls == "Conv1d":
            _convert_conv1d(layer, col, path + ("extractor", f"conv_{conv_i}"))
            conv_i += 1
        elif lcls == "LayerNorm":
            _convert_layernorm(layer, col, path + ("extractor", f"norm_{norm_i}"))
            norm_i += 1
    _convert_conv1d(recomb, col, path + ("linear_recombination",))
    _convert_conv1d(outctx.conv1d, col, path + ("output_context", "conv1d"))
    _convert_layernorm(
        outctx.normalization_fn, col, path + ("output_context", "normalization_fn")
    )
    _convert_conv1d(mod.final_linear, col, path + ("final_linear",))


def convert_head(torch_head) -> Dict[str, Any]:
    """Convert a full reference loss-head module (with encoders) to flax
    variables, including temperature params, projections, the memory bank
    buffer and the KLD lookup/linears."""
    col = _Collector()
    cls = type(torch_head).__name__

    for enc_name in ("eegModel", "speechModel"):
        enc = getattr(torch_head, enc_name, None)
        if enc is None:
            continue
        enc_vars = convert_encoder(enc)
        for collection, tree in enc_vars.items():
            _merge_subtree(col, collection, (enc_name,), tree)

    for pname in ("temperature", "temperature_eeg"):
        p = getattr(torch_head, pname, None)
        if p is not None:
            col.add("params", (pname,), _np(p))

    bank = getattr(torch_head, "eegMemoryBank", None)
    if bank is not None:
        col.add("membank", ("eegMemoryBank", "memory"), _np(bank.memory))

    for lin_name in ("latent_projection_eeg", "latent_projection_speech"):
        lin = getattr(torch_head, lin_name, None)
        if lin is not None:
            _convert_linear(lin, col, (lin_name,))

    emb = getattr(torch_head, "mu_eeg_lookup", None)
    if emb is not None:
        col.add("params", ("mu_eeg_lookup",), _np(emb.weight))

    for proj_name in ("eeg_mu_linear", "eeg_logvar_linear", "speech_latent_projection"):
        proj = getattr(torch_head, proj_name, None)
        if proj is None:
            continue
        pcls = type(proj).__name__
        if pcls == "Linear":
            _convert_linear(proj, col, (proj_name,))
        elif pcls == "ProjectionHeadLinear":
            _convert_linear(proj.projection, col, (proj_name, "projection"))
            _convert_linear(proj.last_linear, col, (proj_name, "last_linear"))
        elif pcls == "ProjectionHead":
            _convert_linear(proj.projection, col, (proj_name, "projection"))
            _convert_linear(proj.fc, col, (proj_name, "fc"))
            _convert_layernorm(proj.layer_norm, col, (proj_name, "layer_norm"))

    return col.variables()


def _merge_subtree(col: _Collector, collection: str, path, tree: Dict):
    for key, val in tree.items():
        if isinstance(val, dict):
            _merge_subtree(col, collection, path + (key,), val)
        else:
            col.add(collection, path + (key,), val)


def convert_regression_model(torch_probe) -> Dict[str, Any]:
    """Reference RegressionModel (helper:1132-1140) → flax variables."""
    col = _Collector()
    _convert_conv1d(torch_probe.conv, col, ("conv",))
    return col.variables()


# --------------------------------------------------------------------------
# State-dict-driven conversion (no torch module instantiation required)
# --------------------------------------------------------------------------
#
# A reference ``checkpoints/model.ckpt`` is a bare ``state_dict`` (ref
# ``train_clip_final.py:531-540``).  The functions below convert it straight
# into flax variables, guided by the *template* variable tree of the already-
# initialized flax model — so the driver can ingest reference checkpoints
# end-to-end without importing the reference's code.  Partial-load semantics
# mirror the reference eval loader (``:546-554``): keys without a template
# match are skipped and reported, template leaves without a checkpoint entry
# keep their initialized values.


def _rewrite_comps(comps):
    """Torch key components → flax path components.

    Handles the structural remaps between the reference's container modules
    and our named flax submodules: TransformerEncoder(Sequential) internals
    (ref clip_model.py:75-99 → block_{i}.ln1/attn/ln2/ffn.fc1/fc2), the
    VLAAI sequentialConvStack (ref vlaai.py:101 → extractor /
    linear_recombination / output_context) and its mixed conv/norm layer
    list (ref vlaai.py:24-41, stride-3 Conv1d/LayerNorm/LeakyReLU groups).
    """
    out = []
    i = 0
    n = len(comps)
    while i < n:
        c = comps[i]
        if (
            c.isdigit()
            and i + 2 < n
            and comps[i + 1] in ("0", "1")
            and comps[i + 2] == "fn"
        ):
            blk = f"block_{c}"
            branch, rest = comps[i + 1], comps[i + 3 :]
            if branch == "0" and rest[:1] == ["0"]:
                out += [blk, "ln1"]
                i += 4
            elif branch == "0" and rest[:1] == ["1"]:
                out += [blk, "attn"]
                i += 4
            elif branch == "1" and rest[:1] == ["0"]:
                out += [blk, "ln2"]
                i += 4
            elif branch == "1" and rest[:2] == ["1", "0"]:
                out += [blk, "ffn", "fc1"]
                i += 5
            elif branch == "1" and rest[:2] == ["1", "3"]:
                out += [blk, "ffn", "fc2"]
                i += 5
            else:
                out.append(c)
                i += 1
            continue
        if c == "sequentialConvStack" and i + 1 < n and comps[i + 1].isdigit():
            out.append(
                {
                    "0": "extractor",
                    "1": "linear_recombination",
                    "2": "output_context",
                }[comps[i + 1]]
            )
            i += 2
            continue
        if c == "conv_layers" and i + 1 < n and comps[i + 1].isdigit():
            j = int(comps[i + 1])
            out.append(f"conv_{j // 3}" if j % 3 == 0 else f"norm_{j // 3}")
            i += 2
            continue
        out.append(c)
        i += 1
    return out


def _resolve_node(tree, comps):
    """Resolve rewritten components against the template params tree.

    Bare digit components that don't exist in the template are Sequential
    wrappers the flax side doesn't have (the reference wraps single layers
    as ``Sequential(layer, activation)``) — they are skipped.  Returns the
    resolved node (a module dict, or a bare param leaf for e.g. the KLD
    ``mu_eeg_lookup`` embedding) or None.
    """
    if not comps:
        return tree
    c = comps[0]
    if isinstance(tree, dict):
        if c in tree:
            r = _resolve_node(tree[c], comps[1:])
            if r is not None:
                return r
        if c.isdigit():
            return _resolve_node(tree, comps[1:])
    return None


def _resolve_path(tree, comps):
    """Like ``_resolve_node`` but returns the flax path taken."""
    if not comps:
        return ()
    c = comps[0]
    if isinstance(tree, dict):
        if c in tree:
            r = _resolve_path(tree[c], comps[1:])
            if r is not None:
                return (c,) + r
        if c.isdigit():
            return _resolve_path(tree, comps[1:])
    return None


def _emit_group(col, path, node, leaves, unmatched, prefix_str):
    """Convert one module's leaf group using type cues (sibling keys + tensor
    rank), validating leaf names against the template node."""
    if "weight_ih_l0" in leaves:
        for tk, fk in (
            ("weight_ih_l0", "kernel_ih"),
            ("weight_hh_l0", "kernel_hh"),
            ("bias_ih_l0", "bias_ih"),
            ("bias_hh_l0", "bias_hh"),
            ("weight_ih_l0_reverse", "kernel_ih_reverse"),
            ("weight_hh_l0_reverse", "kernel_hh_reverse"),
            ("bias_ih_l0_reverse", "bias_ih_reverse"),
            ("bias_hh_l0_reverse", "bias_hh_reverse"),
        ):
            if tk in leaves:
                v = leaves[tk]
                col.add("params", path + (fk,), v.T if v.ndim == 2 else v)
        return
    if "running_mean" in leaves:
        col.add("params", path + ("scale",), leaves["weight"])
        col.add("params", path + ("bias",), leaves["bias"])
        col.add("batch_stats", path + ("mean",), leaves["running_mean"])
        col.add("batch_stats", path + ("var",), leaves["running_var"])
        return
    w = leaves.get("weight")
    if w is None:
        unmatched.append(prefix_str)
        return
    b = leaves.get("bias")
    if not isinstance(node, dict):
        # bare param leaf (embedding table, e.g. mu_eeg_lookup)
        col.add("params", path, w)
        return
    if w.ndim == 3:
        col.add("params", path + ("kernel",), w.transpose(2, 1, 0))
    elif w.ndim == 4:
        col.add("params", path + ("kernel",), w[:, 0, :, 0].T[:, None, :])
    elif w.ndim == 2 and b is not None and b.ndim == 2:
        col.add("params", path + ("scale",), w.T)
        col.add("params", path + ("bias",), b.T)
        return
    elif w.ndim == 2:
        col.add("params", path + ("kernel",), w.T)
    else:  # 1-D LayerNorm
        col.add("params", path + ("scale",), w)
        if b is not None:
            col.add("params", path + ("bias",), b)
        return
    if b is not None:
        col.add("params", path + ("bias",), b)


def convert_state_dict(
    state_dict: Dict[str, Any], template: Dict[str, Any]
) -> Tuple[Dict[str, Any], list]:
    """Reference ``state_dict`` → flax variable trees, template-guided.

    Returns ``(converted, unmatched_keys)`` where ``converted`` holds only
    the leaves present in the checkpoint (merge over the template with
    :func:`merge_variables`).
    """
    params_t = template.get("params", {})
    col = _Collector()
    unmatched: list = []
    groups: Dict[Tuple[str, ...], Dict[str, np.ndarray]] = {}
    for k, t in state_dict.items():
        comps = k.split(".")
        arr = _np(t) if hasattr(t, "detach") else np.asarray(t)
        groups.setdefault(tuple(comps[:-1]), {})[comps[-1]] = arr

    for prefix, leaves in groups.items():
        if not prefix:  # root scalars: temperature, temperature_eeg
            for name, v in leaves.items():
                if name in params_t:
                    col.add("params", (name,), v)
                else:
                    unmatched.append(name)
            continue
        if "memory" in leaves:  # memoryBank buffer → membank collection
            col.add("membank", prefix + ("memory",), leaves["memory"])
            continue
        comps = _rewrite_comps(list(prefix))
        node = _resolve_node(params_t, comps)
        path = _resolve_path(params_t, comps)
        if node is None or path is None:
            unmatched.append(".".join(prefix))
            continue
        _emit_group(col, path, node, leaves, unmatched, ".".join(prefix))
    return col.variables(), unmatched


def merge_variables(
    template: Dict[str, Any], converted: Dict[str, Any]
) -> Tuple[Dict[str, Any], list]:
    """Overlay converted leaves onto a deep copy of the template.

    Shape-mismatched leaves are skipped (reported), mirroring the
    reference's filter-unknown-keys partial load (ref :546-554).
    """
    skipped: list = []

    def merge(tpl, conv, path):
        if not isinstance(tpl, dict):
            if isinstance(conv, dict):
                skipped.append("/".join(path))
                return tpl
            if np.shape(conv) != np.shape(tpl):
                skipped.append("/".join(path))
                return tpl
            return np.asarray(conv, dtype=np.asarray(tpl).dtype)
        out = {}
        for k, v in tpl.items():
            if isinstance(conv, dict) and k in conv:
                out[k] = merge(v, conv[k], path + (k,))
            else:
                out[k] = v
        if isinstance(conv, dict):
            for k in conv:
                if k not in tpl:
                    skipped.append("/".join(path + (k,)))
        return out

    merged = {
        c: merge(template.get(c, {}), converted.get(c, {}), (c,))
        for c in set(template) | set(converted)
    }
    return merged, skipped


def load_torch_state_dict(source, template: Dict[str, Any]):
    """One-call ingest: reference ``model.ckpt`` path (or a loaded
    state_dict) + template variables → ``(merged_variables, report)``.

    ``report`` lists checkpoint keys without a template match and template
    leaves skipped for shape mismatch — empty for a faithful pair.
    """
    if isinstance(source, (str, os.PathLike)):
        import torch

        source = torch.load(source, map_location="cpu")
    converted, unmatched = convert_state_dict(source, template)
    merged, skipped = merge_variables(template, converted)
    return merged, unmatched + skipped


def load_torch_checkpoint(path: str, torch_model_factory) -> Dict[str, Any]:
    """Load a reference ``model.ckpt`` state_dict into flax variables.

    ``torch_model_factory`` must build the matching reference torch module
    (so the state_dict can be materialized before structural conversion).
    """
    import torch

    state = torch.load(path, map_location="cpu")
    model = torch_model_factory()
    model.load_state_dict(state, strict=False)
    return convert_head(model)
