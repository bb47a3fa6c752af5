"""Torch-checkpoint -> flax parameter conversion toolkit.

Checkpoint-parity tooling (SURVEY.md §7.5): loads a released reference
checkpoint (PyTorch Lightning ``.ckpt``, reference evaluate.py:33) and maps
its ``state_dict`` onto a flax variable tree.  Torch is only needed on the
host to read the pickle; everything downstream is numpy.

Layout rules (torch -> flax, channels-last):
  Conv2d weight      (O, I, kH, kW)   -> kernel (kH, kW, I, O)
  Conv3d weight      (O, I, kD, kH, kW) -> (kD, kH, kW, I, O)
  ConvTranspose2d    (I, O, kH, kW)   -> flax ConvTranspose kernel
                                          (kH, kW, I, O) with spatially
                                          flipped taps (lax conv_transpose
                                          correlates; torch convolves)
  Linear weight      (O, I)           -> kernel (I, O)
  BatchNorm          weight/bias      -> scale/bias (params)
                     running_mean/var -> mean/var  (batch_stats)
  GRUCell            weight_ih (3H,I) -> Dense kernels ir/iz/in (I,H)
                     weight_hh (3H,H) -> hr/hz/hn, gate order (r, z, n)

The mapping between tree paths is declarative: a list of (flax_path_prefix,
torch_prefix, kind) rules, applied longest-prefix-first.  ``report`` lists
any unconsumed torch keys / unfilled flax leaves so partial loads
(reference train.py:50-58 warm-start drops decoder keys) are explicit.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np


# --------------------------------------------------------------- tensor rules
def convert_conv(w: np.ndarray) -> np.ndarray:
    """(O, I, *spatial) -> (*spatial, I, O)."""
    nd = w.ndim
    return np.transpose(w, (*range(2, nd), 1, 0))


def convert_conv_transpose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose (I, O, kH, kW) -> flax (kH, kW, I, O), taps
    flipped (torch transposed-conv scatters the kernel; lax.conv_transpose
    with transpose_kernel=False cross-correlates a fractionally-strided
    input, which is equivalent after a spatial flip + in/out swap)."""
    nd = w.ndim
    w = np.transpose(w, (*range(2, nd), 0, 1))   # (kH, kW, I, O)
    flip = tuple(range(nd - 2))
    return np.flip(w, axis=flip)


def convert_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def split_gru_matrix(w: np.ndarray) -> Dict[str, np.ndarray]:
    """torch GRU packed (3H, I) with gate order (r, z, n) -> per-gate
    flax Dense kernels (I, H)."""
    h3 = w.shape[0]
    assert h3 % 3 == 0
    h = h3 // 3
    return {'r': w[:h].T, 'z': w[h:2 * h].T, 'n': w[2 * h:].T}


def split_gru_bias(b: np.ndarray) -> Dict[str, np.ndarray]:
    h = b.shape[0] // 3
    return {'r': b[:h], 'z': b[h:2 * h], 'n': b[2 * h:]}


# ------------------------------------------------------------------ tree util
def flatten_tree(tree: Any, prefix: str = '') -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f'{prefix}{k}/' if prefix or True
                                    else k))
    else:
        out[prefix.rstrip('/')] = tree
    return out


def unflatten_tree(flat: Dict[str, Any]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for path, v in flat.items():
        parts = path.split('/')
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return root


# ------------------------------------------------------------- torch loading
def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``.ckpt``/``.pth`` into {key: np.ndarray}.

    Lightning checkpoints nest the weights under 'state_dict' and prefix
    'model.' (reference TrainingModule owns ``self.model``)."""
    import torch
    raw = torch.load(path, map_location='cpu', weights_only=False)
    sd = raw.get('state_dict', raw) if isinstance(raw, dict) else raw
    out = {}
    for k, v in sd.items():
        if hasattr(v, 'numpy'):
            out[k] = v.detach().cpu().numpy()
    return out


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str = 'model.'
                 ) -> Dict[str, np.ndarray]:
    return {k[len(prefix):] if k.startswith(prefix) else k: v
            for k, v in sd.items()}


# ------------------------------------------------------------------- mapping
class Rule(Tuple[str, str, str]):
    """(flax_path_regex, torch_key_template, kind).

    kind in {'conv', 'conv_transpose', 'linear', 'bn', 'gru', 'raw',
    'conv_cat', 'raw_cat'} — the *_cat kinds take '|'-joined torch keys and
    concatenate them on the output axis (fused conv kernels / biases).
    The torch template may use backreferences (\\1, ...) from the flax
    regex.  For 'bn' the template is the torch module prefix (without
    `.weight`); for 'gru' it is the torch GRUCell prefix."""


def _bn_leaves(torch_prefix: str, sd: Dict[str, np.ndarray],
               leaf: str) -> np.ndarray | None:
    names = {'scale': 'weight', 'bias': 'bias',
             'mean': 'running_mean', 'var': 'running_var'}
    key = f'{torch_prefix}.{names[leaf]}'
    return sd.get(key)


def apply_mapping(flax_flat: Dict[str, np.ndarray],
                  sd: Dict[str, np.ndarray],
                  rules: Sequence[Tuple[str, str, str]],
                  strict_shapes: bool = True):
    """Fill flax leaves from the torch state dict.

    Returns (new_flat, report) where report = dict(filled, missing,
    unused_torch)."""
    new_flat = dict(flax_flat)
    used: set = set()
    filled: List[str] = []
    missing: List[str] = []

    for path, value in flax_flat.items():
        want_shape = tuple(np.shape(value))
        got = None
        wrong_shape = None   # (torch_key, shape) of a shape-mismatched hit
        for pattern, template, kind in rules:
            m = re.fullmatch(pattern, path)
            if not m:
                continue
            tkey = m.expand(template)
            cand = None
            cand_used = None
            if kind == 'bn':
                leaf = path.rsplit('/', 1)[-1]
                t = _bn_leaves(tkey, sd, leaf)
                if t is not None:
                    cand = t
                    names = {'scale': 'weight', 'bias': 'bias',
                             'mean': 'running_mean', 'var': 'running_var'}
                    cand_used = f'{tkey}.{names[leaf]}'
            elif kind == 'gru':
                leaf = path.rsplit('/', 1)[-1]      # e.g. ir/kernel flattened
                parts = path.split('/')
                gate = parts[-2]                     # ir, iz, in, hr, hz, hn
                side = 'ih' if gate[0] == 'i' else 'hh'
                gname = {'r': 'r', 'z': 'z', 'n': 'n'}[gate[-1]]
                if leaf == 'kernel':
                    t = sd.get(f'{tkey}.weight_{side}')
                    if t is not None:
                        cand = split_gru_matrix(t)[gname]
                        cand_used = f'{tkey}.weight_{side}'
                else:
                    t = sd.get(f'{tkey}.bias_{side}')
                    if t is not None:
                        cand = split_gru_bias(t)[gname]
                        cand_used = f'{tkey}.bias_{side}'
            elif kind in ('conv_cat', 'raw_cat'):
                # '|'-joined torch keys concatenated on the output axis
                # (fused conv kernels / biases, e.g. GRU update‖reset)
                keys = tkey.split('|')
                parts = [sd.get(k) for k in keys]
                if all(p is not None for p in parts):
                    if kind == 'conv_cat':
                        parts = [convert_conv(p) for p in parts]
                    cand = np.concatenate(parts, axis=-1)
                    cand_used = tuple(keys)
            else:
                t = sd.get(tkey)
                if t is not None:
                    cand_used = tkey
                    if path.endswith('kernel') and kind == 'conv':
                        cand = convert_conv(t)
                    elif path.endswith('kernel') and kind == 'conv_transpose':
                        cand = convert_conv_transpose(t)
                    elif path.endswith('kernel') and kind == 'linear':
                        cand = convert_linear(t)
                    elif kind == 'spconv':
                        # spconv stores (kD, kH, kW, I, O); engine stores
                        # flattened taps (kD*kH*kW, I, O) — leaves are named
                        # kernel / kernel1 / kernel2
                        cand = np.asarray(t).reshape(-1, *t.shape[-2:])
                    else:
                        cand = t
            if cand is None:
                continue
            already = (any(k in used for k in cand_used)
                       if isinstance(cand_used, tuple) else cand_used in used)
            if already and kind != 'gru':
                # already consumed by an earlier flax leaf (structure-variant
                # fall-through must not alias two leaves onto one tensor);
                # 'gru' legitimately splits one packed matrix across gates
                continue
            cand = np.asarray(cand)
            if cand.shape != want_shape:
                # structure-variant blocks (e.g. no-expand MBConv, BasicBlock
                # without downsample) legitimately shift numbering: treat a
                # shape mismatch as a miss and try the next rule
                wrong_shape = (cand_used, cand.shape)
                continue
            got = cand
            if isinstance(cand_used, tuple):
                used.update(cand_used)
            else:
                used.add(cand_used)
            break
        if got is None:
            if wrong_shape is not None and strict_shapes:
                raise ValueError(
                    f'{path}: no rule matched with the right shape; best '
                    f'candidate {wrong_shape[0]} had {wrong_shape[1]}, '
                    f'expected {want_shape}')
            missing.append(path)
            continue
        new_flat[path] = got.astype(np.asarray(value).dtype)
        filled.append(path)

    unused = sorted(set(sd) - used)
    return new_flat, {'filled': filled, 'missing': missing,
                      'unused_torch': unused}


def convert_variables(variables: Dict[str, Any], sd: Dict[str, np.ndarray],
                      rules: Sequence[Tuple[str, str, str]],
                      strict_shapes: bool = True):
    """Convert a full flax variable dict ({'params': ..., 'batch_stats': ...})."""
    import jax
    flat = flatten_tree(jax.tree.map(np.asarray, variables))
    new_flat, report = apply_mapping(flat, sd, rules, strict_shapes)
    return unflatten_tree(new_flat), report
