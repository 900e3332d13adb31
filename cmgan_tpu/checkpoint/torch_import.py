"""Import reference PyTorch checkpoints into this framework.

Maps the reference TSCNet state_dict layout (src/models/generator.py,
src/models/conformer.py — NCHW convs, [out,in] linears, Scale/PreNorm
wrapper nesting) onto our channels-last flax tree, so the released
`best_ckpt` evaluates bit-faithfully on TPU. Layout transforms:

  Conv2d  [O,I,kh,kw] -> [kh,kw,I,O]   (generator: H=time, W=freq —
                                        same orientation as our [B,T,F,C])
  Conv1d  [O,I,k]     -> [k,I,O]
  Linear  [O,I]       -> [I,O]
  PReLU weight        -> alpha
  InstanceNorm/LayerNorm/BatchNorm weight -> scale
  BatchNorm running_mean/var -> batch_stats mean/var
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _conv1d(w):
    return np.transpose(w, (2, 1, 0))


def _linear(w):
    return np.transpose(w, (1, 0))


def _ident(w):
    return w


def _conformer_param_map(prefix_t: str, prefix_f: str) -> Dict[str, tuple]:
    """torch ConformerBlock key -> (flax param path, transform).

    torch nesting (reference src/models/conformer.py:196-214):
      ff1 = Scale(0.5, PreNorm(dim, FeedForward)) -> ff1.fn.norm,
      ff1.fn.fn.net.{0,3}; attn = PreNorm(dim, Attention) -> attn.norm,
      attn.fn.*; conv.net indices: 0 LN, 2 pw-in Conv1d, 4 depthwise,
      5 BatchNorm1d, 7 pw-out Conv1d.
    """
    m = {}
    for ff in ("ff1", "ff2"):
        m[f"{prefix_t}.{ff}.fn.norm.weight"] = (f"{prefix_f}/{ff}_norm/scale", _ident)
        m[f"{prefix_t}.{ff}.fn.norm.bias"] = (f"{prefix_f}/{ff}_norm/bias", _ident)
        m[f"{prefix_t}.{ff}.fn.fn.net.0.weight"] = (
            f"{prefix_f}/{ff}/in_proj/dense/kernel", _linear)
        m[f"{prefix_t}.{ff}.fn.fn.net.0.bias"] = (
            f"{prefix_f}/{ff}/in_proj/dense/bias", _ident)
        m[f"{prefix_t}.{ff}.fn.fn.net.3.weight"] = (
            f"{prefix_f}/{ff}/out_proj/dense/kernel", _linear)
        m[f"{prefix_t}.{ff}.fn.fn.net.3.bias"] = (
            f"{prefix_f}/{ff}/out_proj/dense/bias", _ident)
    m[f"{prefix_t}.attn.norm.weight"] = (f"{prefix_f}/attn_norm/scale", _ident)
    m[f"{prefix_t}.attn.norm.bias"] = (f"{prefix_f}/attn_norm/bias", _ident)
    m[f"{prefix_t}.attn.fn.to_q.weight"] = (f"{prefix_f}/attn/to_q/dense/kernel", _linear)
    m[f"{prefix_t}.attn.fn.to_kv.weight"] = (f"{prefix_f}/attn/to_kv/dense/kernel", _linear)
    m[f"{prefix_t}.attn.fn.to_out.weight"] = (f"{prefix_f}/attn/to_out/dense/kernel", _linear)
    m[f"{prefix_t}.attn.fn.to_out.bias"] = (f"{prefix_f}/attn/to_out/dense/bias", _ident)
    m[f"{prefix_t}.attn.fn.rel_pos_emb.weight"] = (f"{prefix_f}/attn/rel_pos_emb", _ident)
    m[f"{prefix_t}.conv.net.0.weight"] = (f"{prefix_f}/conv/norm/scale", _ident)
    m[f"{prefix_t}.conv.net.0.bias"] = (f"{prefix_f}/conv/norm/bias", _ident)
    m[f"{prefix_t}.conv.net.2.weight"] = (f"{prefix_f}/conv/pw_in/conv/kernel", _conv1d)
    m[f"{prefix_t}.conv.net.2.bias"] = (f"{prefix_f}/conv/pw_in/conv/bias", _ident)
    m[f"{prefix_t}.conv.net.4.conv.weight"] = (f"{prefix_f}/conv/dw_conv/conv/kernel", _conv1d)
    m[f"{prefix_t}.conv.net.4.conv.bias"] = (f"{prefix_f}/conv/dw_conv/conv/bias", _ident)
    m[f"{prefix_t}.conv.net.5.weight"] = (f"{prefix_f}/conv/bn/scale", _ident)
    m[f"{prefix_t}.conv.net.5.bias"] = (f"{prefix_f}/conv/bn/bias", _ident)
    m[f"{prefix_t}.conv.net.7.weight"] = (f"{prefix_f}/conv/pw_out/conv/kernel", _conv1d)
    m[f"{prefix_t}.conv.net.7.bias"] = (f"{prefix_f}/conv/pw_out/conv/bias", _ident)
    m[f"{prefix_t}.post_norm.weight"] = (f"{prefix_f}/post_norm/scale", _ident)
    m[f"{prefix_t}.post_norm.bias"] = (f"{prefix_f}/post_norm/bias", _ident)
    return m


def _conformer_stats_map(prefix_t: str, prefix_f: str) -> Dict[str, tuple]:
    return {
        f"{prefix_t}.conv.net.5.running_mean": (f"{prefix_f}/conv/bn/mean", _ident),
        f"{prefix_t}.conv.net.5.running_var": (f"{prefix_f}/conv/bn/var", _ident),
    }


def _dense_block_map(prefix_t: str, prefix_f: str, depth: int = 4) -> Dict[str, tuple]:
    m = {}
    for i in range(1, depth + 1):
        m[f"{prefix_t}.conv{i}.weight"] = (f"{prefix_f}/conv{i}/kernel", _conv2d)
        m[f"{prefix_t}.conv{i}.bias"] = (f"{prefix_f}/conv{i}/bias", _ident)
        m[f"{prefix_t}.norm{i}.weight"] = (f"{prefix_f}/norm{i}/scale", _ident)
        m[f"{prefix_t}.norm{i}.bias"] = (f"{prefix_f}/norm{i}/bias", _ident)
        m[f"{prefix_t}.prelu{i}.weight"] = (f"{prefix_f}/prelu{i}/alpha", _ident)
    return m


def generator_param_map(num_tscb: int = 4) -> Dict[str, tuple]:
    m = {}
    # DenseEncoder (torch Sequentials: conv_1=[conv,IN,PReLU], conv_2 same)
    m["dense_encoder.conv_1.0.weight"] = ("encoder/conv_in/conv/kernel", _conv2d)
    m["dense_encoder.conv_1.0.bias"] = ("encoder/conv_in/conv/bias", _ident)
    m["dense_encoder.conv_1.1.weight"] = ("encoder/norm_in/scale", _ident)
    m["dense_encoder.conv_1.1.bias"] = ("encoder/norm_in/bias", _ident)
    m["dense_encoder.conv_1.2.weight"] = ("encoder/prelu_in/alpha", _ident)
    m.update(_dense_block_map("dense_encoder.dilated_dense", "encoder/dense"))
    m["dense_encoder.conv_2.0.weight"] = ("encoder/conv_down/conv/kernel", _conv2d)
    m["dense_encoder.conv_2.0.bias"] = ("encoder/conv_down/conv/bias", _ident)
    m["dense_encoder.conv_2.1.weight"] = ("encoder/norm_down/scale", _ident)
    m["dense_encoder.conv_2.1.bias"] = ("encoder/norm_down/bias", _ident)
    m["dense_encoder.conv_2.2.weight"] = ("encoder/prelu_down/alpha", _ident)
    # TSCB blocks
    for k in range(1, num_tscb + 1):
        for which in ("time", "freq"):
            m.update(
                _conformer_param_map(
                    f"TSCB_{k}.{which}_conformer",
                    f"tscb_{k}/{which}_conformer",
                )
            )
    # MaskDecoder
    m.update(_dense_block_map("mask_decoder.dense_block", "mask_decoder/dense"))
    m["mask_decoder.sub_pixel.conv.weight"] = ("mask_decoder/sub_pixel/conv/conv/kernel", _conv2d)
    m["mask_decoder.sub_pixel.conv.bias"] = ("mask_decoder/sub_pixel/conv/conv/bias", _ident)
    m["mask_decoder.conv_1.weight"] = ("mask_decoder/conv_1/conv/kernel", _conv2d)
    m["mask_decoder.conv_1.bias"] = ("mask_decoder/conv_1/conv/bias", _ident)
    m["mask_decoder.norm.weight"] = ("mask_decoder/norm/scale", _ident)
    m["mask_decoder.norm.bias"] = ("mask_decoder/norm/bias", _ident)
    m["mask_decoder.prelu.weight"] = ("mask_decoder/prelu/alpha", _ident)
    m["mask_decoder.final_conv.weight"] = ("mask_decoder/final_conv/conv/kernel", _conv2d)
    m["mask_decoder.final_conv.bias"] = ("mask_decoder/final_conv/conv/bias", _ident)
    m["mask_decoder.prelu_out.weight"] = ("mask_decoder/prelu_out/alpha", _ident)
    # ComplexDecoder
    m.update(_dense_block_map("complex_decoder.dense_block", "complex_decoder/dense"))
    m["complex_decoder.sub_pixel.conv.weight"] = ("complex_decoder/sub_pixel/conv/conv/kernel", _conv2d)
    m["complex_decoder.sub_pixel.conv.bias"] = ("complex_decoder/sub_pixel/conv/conv/bias", _ident)
    m["complex_decoder.norm.weight"] = ("complex_decoder/norm/scale", _ident)
    m["complex_decoder.norm.bias"] = ("complex_decoder/norm/bias", _ident)
    m["complex_decoder.prelu.weight"] = ("complex_decoder/prelu/alpha", _ident)
    m["complex_decoder.conv.weight"] = ("complex_decoder/conv/conv/kernel", _conv2d)
    m["complex_decoder.conv.bias"] = ("complex_decoder/conv/conv/bias", _ident)
    return m


def generator_stats_map(num_tscb: int = 4) -> Dict[str, tuple]:
    m = {}
    for k in range(1, num_tscb + 1):
        for which in ("time", "freq"):
            m.update(
                _conformer_stats_map(
                    f"TSCB_{k}.{which}_conformer",
                    f"tscb_{k}/{which}_conformer",
                )
            )
    return m


def import_generator_state_dict(state_dict, variables, num_tscb: int = 4):
    """Map a reference TSCNet state_dict onto a flax variables template.

    state_dict: {name: numpy array}; variables: {'params', 'batch_stats'}.
    Returns new variables; raises on any missing/extra/mismatched entry.
    """
    import flax

    state_dict = {
        k: np.asarray(v) for k, v in state_dict.items()
        if not k.endswith("num_batches_tracked")
    }

    params = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    stats = flax.traverse_util.flatten_dict(variables["batch_stats"], sep="/")

    pmap = generator_param_map(num_tscb)
    smap = generator_stats_map(num_tscb)

    missing = (set(pmap) | set(smap)) - set(state_dict)
    extra = set(state_dict) - set(pmap) - set(smap)
    if missing or extra:
        raise ValueError(f"state_dict mismatch: missing={sorted(missing)[:5]} "
                         f"extra={sorted(extra)[:5]}")

    new_params = dict(params)
    for tkey, (fkey, tf) in pmap.items():
        w = tf(state_dict[tkey]).astype(np.float32)
        if fkey not in new_params:
            raise KeyError(f"flax param {fkey} not found")
        if new_params[fkey].shape != w.shape:
            raise ValueError(f"{fkey}: {new_params[fkey].shape} vs {w.shape}")
        new_params[fkey] = w
    new_stats = dict(stats)
    for tkey, (fkey, tf) in smap.items():
        w = tf(state_dict[tkey]).astype(np.float32)
        if new_stats[fkey].shape != w.shape:
            raise ValueError(f"{fkey}: {new_stats[fkey].shape} vs {w.shape}")
        new_stats[fkey] = w

    return {
        "params": flax.traverse_util.unflatten_dict(new_params, sep="/"),
        "batch_stats": flax.traverse_util.unflatten_dict(new_stats, sep="/"),
    }


def load_torch_generator(path: str, variables, num_tscb: int = 4):
    """Load a reference .pt/.ckpt file (torch state_dict) into variables."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    return import_generator_state_dict(sd, variables, num_tscb)


_INVERSE = {
    _conv2d: lambda w: np.transpose(w, (3, 2, 0, 1)),
    _conv1d: lambda w: np.transpose(w, (2, 1, 0)),
    _linear: lambda w: np.transpose(w, (1, 0)),
    _ident: lambda w: w,
}


def export_generator_state_dict(variables, num_tscb: int = 4):
    """Inverse of import: flax variables -> reference torch state_dict
    layout (numpy arrays), so models trained here can be evaluated with
    the reference code."""
    import flax

    params = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    stats = flax.traverse_util.flatten_dict(variables["batch_stats"], sep="/")

    out = {}
    for tkey, (fkey, tf) in generator_param_map(num_tscb).items():
        out[tkey] = _INVERSE[tf](np.asarray(params[fkey]))
    for tkey, (fkey, tf) in generator_stats_map(num_tscb).items():
        out[tkey] = _INVERSE[tf](np.asarray(stats[fkey]))
        # torch BatchNorm also tracks num_batches_tracked
        nbt = tkey.rsplit(".", 1)[0] + ".num_batches_tracked"
        out.setdefault(nbt, np.asarray(0, np.int64))
    return out


def save_torch_generator(path: str, variables, num_tscb: int = 4):
    """Write a reference-compatible torch checkpoint file."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_generator_state_dict(variables, num_tscb).items()
    }
    torch.save(sd, path)
