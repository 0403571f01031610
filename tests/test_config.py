import pytest

from sigdigger_tpu.config import (
    AUDIO_INSPECTOR_SCHEMA,
    INSPECTOR_SCHEMAS,
    Config,
    PSK_INSPECTOR_SCHEMA,
)
from sigdigger_tpu.types import AnalyzerParams, WindowFunction


def test_schema_contract_keys():
    """The suscan inspector config-key contract (SURVEY.md §5.6)."""
    psk = PSK_INSPECTOR_SCHEMA
    for key in ("agc.enabled", "afc.bits-per-symbol", "afc.loop-bw",
                "mf.roll-off", "clock.baud", "clock.type",
                "equalizer.type"):
        assert key in psk, key
    audio = AUDIO_INSPECTOR_SCHEMA
    for key in ("audio.cutoff", "audio.volume", "audio.sample-rate",
                "audio.demodulator", "audio.squelch",
                "audio.squelch-level", "agc.enabled"):
        assert key in audio, key
    assert set(INSPECTOR_SCHEMAS) == {"psk", "fsk", "ask", "audio", "raw",
                                      "power"}


def test_config_typed_set_get():
    cfg = Config(PSK_INSPECTOR_SCHEMA)
    assert cfg["agc.enabled"] is True
    cfg["afc.bits-per-symbol"] = "2"
    assert cfg["afc.bits-per-symbol"] == 2
    cfg["agc.enabled"] = "false"
    assert cfg["agc.enabled"] is False
    cfg["clock.baud"] = 1200
    assert isinstance(cfg["clock.baud"], float)
    with pytest.raises(KeyError):
        cfg["bogus.key"] = 1


def test_config_json_roundtrip():
    cfg = Config(AUDIO_INSPECTOR_SCHEMA)
    cfg["audio.demodulator"] = 2
    cfg["audio.cutoff"] = 8000.0
    back = Config.from_json(AUDIO_INSPECTOR_SCHEMA, cfg.to_json())
    assert back == cfg


def test_analyzer_params_roundtrip():
    p = AnalyzerParams(window_size=8192,
                       window_function=WindowFunction.HANN,
                       spectrum_avg_alpha=0.01)
    q = AnalyzerParams.from_dict(p.to_dict())
    assert q == p
