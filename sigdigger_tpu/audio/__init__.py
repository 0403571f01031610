from sigdigger_tpu.audio.alsa import AlsaPlayer
from sigdigger_tpu.audio.alsa import (
    register_if_available as _alsa_register,
)
from sigdigger_tpu.audio.playback import (
    AudioFileSaver,
    AudioPlayback,
    GenericAudioPlayer,
    NullAudioPlayer,
)

_alsa_register()

__all__ = [
    "AlsaPlayer",
    "AudioFileSaver",
    "AudioPlayback",
    "GenericAudioPlayer",
    "NullAudioPlayer",
]
