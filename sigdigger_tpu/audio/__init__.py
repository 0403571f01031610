from sigdigger_tpu.audio.playback import (
    AudioFileSaver,
    AudioPlayback,
    GenericAudioPlayer,
    NullAudioPlayer,
)

__all__ = [
    "AudioFileSaver",
    "AudioPlayback",
    "GenericAudioPlayer",
    "NullAudioPlayer",
]
