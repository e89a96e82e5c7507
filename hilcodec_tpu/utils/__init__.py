from .hparams import HParams, load_config, update_params, get_hparams, save_config_snapshot


def verbose() -> bool:
    """True on the logging host (process 0) — rank-0 gating
    (reference utils/verbose.py:4-7)."""
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


__all__ = [
    "HParams", "load_config", "update_params", "get_hparams",
    "save_config_snapshot", "verbose",
]
