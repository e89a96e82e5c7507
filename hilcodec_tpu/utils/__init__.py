from .hparams import HParams, load_config, update_params, get_hparams, save_config_snapshot

__all__ = [
    "HParams", "load_config", "update_params", "get_hparams",
    "save_config_snapshot",
]
