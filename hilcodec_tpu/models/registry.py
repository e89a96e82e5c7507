"""Model registry: config `model:` name -> builder.

Reference: models/__init__.py:4-11 maps names to wrapper classes; here each
entry builds the generator bundle from `model_kwargs`.
"""

from __future__ import annotations

from typing import Any, Dict

from ..ops.rvq import ResidualVQ
from .audiodec import AudioDec
from .avocodo import AvocodoModel
from .codec import CodecModel
from .encodec import EncodecModel
from .hilcodec import HILCodec


def _vq_from_kwargs(vq_kwargs: Dict[str, Any]) -> ResidualVQ:
    return ResidualVQ(
        dim=vq_kwargs.get("dim", 128),
        codebook_size=vq_kwargs.get("codebook_size", 1024),
        num_quantizers=vq_kwargs.get("num_quantizers", 8),
        kmeans_init=vq_kwargs.get("kmeans_init", True),
        decay=vq_kwargs.get("decay", 0.99),
        ema_num_threshold=vq_kwargs.get("ema_num_threshold", 0.0),
        ema_num_initial=vq_kwargs.get("ema_num_initial", 1.0),
        dropout=vq_kwargs.get("dropout", False),
        dropout_index=tuple(vq_kwargs["dropout_index"])
        if vq_kwargs.get("dropout_index") else None)


def build_hilcodec(model_kwargs: Dict[str, Any]) -> CodecModel:
    return CodecModel.from_config(model_kwargs)


def build_encodec(model_kwargs: Dict[str, Any]) -> CodecModel:
    kw = dict(model_kwargs)
    vq_kwargs = kw.pop("vq_kwargs", {"dim": 128, "codebook_size": 1024,
                                     "num_quantizers": 32})
    import dataclasses
    keep = {f.name for f in dataclasses.fields(EncodecModel)}
    mapped = {k: v for k, v in kw.items() if k in keep}
    if "strides" in mapped:
        mapped["strides"] = tuple(mapped["strides"])
    mapped["vq_dim"] = vq_kwargs.get("dim", 128)
    codec = EncodecModel(**mapped)
    return CodecModel(codec, _vq_from_kwargs(vq_kwargs))


def build_avocodo(model_kwargs: Dict[str, Any]):
    return AvocodoModel.from_config(model_kwargs)


def build_audiodec(model_kwargs: Dict[str, Any]) -> AudioDec:
    import dataclasses
    keep = {f.name for f in dataclasses.fields(AudioDec)}
    return AudioDec(**{k: v for k, v in model_kwargs.items() if k in keep})


MODELS = {
    "hilcodec": build_hilcodec,
    "encodec": build_encodec,
    "avocodo": build_avocodo,
    "audiodec": build_audiodec,
}


def build_model(name: str, model_kwargs: Dict[str, Any]):
    if name not in MODELS:
        raise ValueError(f"unknown model {name!r}; known: {list(MODELS)}")
    return MODELS[name](model_kwargs)


def build_codec_model(name: str, model_kwargs: Dict[str, Any]) -> CodecModel:
    """Streaming/deployment surface for every family: a CodecModel
    (init -> (params, vq_state), encode/decode, encode_stream/decode_stream,
    init_cache, fold_params). hilcodec/encodec already build one; avocodo
    and audiodec return bare generators from build_model (their trainers
    use family-specific wrappers), so wrap them here — this is what
    infer.py / export.py need."""
    m = build_model(name, model_kwargs)
    if hasattr(m, "encode_stream"):
        return m
    vq_kwargs = dict(model_kwargs.get("vq_kwargs", {}))
    # audiodec configs carry no vq_kwargs; its RVQ dim is the code_dim
    vq_kwargs.setdefault("dim", getattr(m, "vq_dim", None)
                         or getattr(m, "code_dim", 128))
    return CodecModel(m, _vq_from_kwargs(vq_kwargs))
