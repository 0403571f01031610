from sigdigger_tpu.utils.globalprop import GlobalProperty

__all__ = ["GlobalProperty"]
