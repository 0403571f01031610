"""The Library singleton — global registries + persistence.

Equivalent of `Suscan::Singleton` (reference include/Suscan/Library.h:
254-448, Suscan/Library.cpp): the process-wide registry of source
profiles, bookmarks, palettes, TLE sets/sources, locations, auto-gain
tables and UI configuration, initialized at startup (reference
App/Loader.cpp:44-79 init_* sequence) and persisted on exit.  XML
`suscan_object` storage is replaced by a JSON directory
(``~/.sigdigger_tpu`` by default).
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass, field
from typing import Any

from sigdigger_tpu.orbit.tle import TLE, parse_tle
from sigdigger_tpu.profiles import SourceProfile
from sigdigger_tpu.utils.palette import DEFAULT_PALETTES, Palette


@dataclass
class Bookmark:
    """reference Misc/BookmarkTableModel.cpp rows."""

    name: str
    frequency: float
    color: str = "#fefefe"
    low_freq_cut: float = 0.0
    high_freq_cut: float = 0.0
    modulation: str = ""


@dataclass
class Location:
    """Observer site (reference Settings/LocationConfigTab)."""

    name: str
    latitude: float
    longitude: float
    altitude: float = 0.0


@dataclass
class AutoGain:
    """Table-driven gain presets per device driver (reference
    Misc/AutoGain.cpp): for a given 'level', each named gain gets a
    value."""

    name: str
    driver: str
    table: list[dict[str, float]] = field(default_factory=list)

    def gains_for_level(self, level: int) -> dict[str, float]:
        if not self.table:
            return {}
        level = max(0, min(level, len(self.table) - 1))
        return dict(self.table[level])


class Library:
    """Process-wide singleton (``Library.instance()``)."""

    _instance: "Library | None" = None
    _lock = threading.Lock()

    def __init__(self, config_dir: str | None = None) -> None:
        self.config_dir = config_dir or os.path.expanduser(
            os.environ.get("SIGDIGGER_TPU_CONFIG", "~/.sigdigger_tpu"))
        self.profiles: dict[str, SourceProfile] = {}
        self.bookmarks: dict[float, Bookmark] = {}
        self.palettes: dict[str, Palette] = dict(DEFAULT_PALETTES)
        self.tle_sets: dict[str, TLE] = {}
        self.tle_sources: dict[str, str] = {
            # reference default TLE source list (Settings/TLESourcesTab)
            "Amateur satellites":
                "https://celestrak.org/NORAD/elements/amateur.txt",
            "Weather satellites":
                "https://celestrak.org/NORAD/elements/weather.txt",
        }
        self.locations: dict[str, Location] = {}
        self.autogains: dict[str, AutoGain] = {}
        self.ui_config: dict[str, Any] = {}
        self.recent: list[str] = []

    # -- singleton ---------------------------------------------------------
    @classmethod
    def instance(cls) -> "Library":
        with cls._lock:
            if cls._instance is None:
                cls._instance = cls()
                cls._instance.load()
            return cls._instance

    @classmethod
    def reset(cls) -> None:
        with cls._lock:
            cls._instance = None

    # -- registries --------------------------------------------------------
    def save_profile(self, profile: SourceProfile) -> None:
        self.profiles[profile.label] = profile

    def register_bookmark(self, bm: Bookmark) -> bool:
        if bm.frequency in self.bookmarks:
            return False
        self.bookmarks[bm.frequency] = bm
        return True

    def remove_bookmark(self, frequency: float) -> None:
        self.bookmarks.pop(frequency, None)

    def register_palette(self, palette: Palette) -> None:
        self.palettes[palette.name] = palette

    def register_tle(self, text: str) -> int:
        """Register TLEs from file body (reference Singleton::registerTLE
        fed by TLEDownloaderTask)."""
        tles = parse_tle(text)
        for t in tles:
            self.tle_sets[t.name] = t
        return len(tles)

    def register_location(self, loc: Location) -> None:
        self.locations[loc.name] = loc

    def register_autogain(self, ag: AutoGain) -> None:
        self.autogains[f"{ag.driver}:{ag.name}"] = ag

    def push_recent(self, path: str, limit: int = 10) -> None:
        if path in self.recent:
            self.recent.remove(path)
        self.recent.insert(0, path)
        del self.recent[limit:]

    # -- persistence -------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.config_dir, name + ".json")

    def save(self) -> None:
        os.makedirs(self.config_dir, exist_ok=True)
        blobs = {
            "profiles": {k: v.to_dict() for k, v in self.profiles.items()},
            "bookmarks": {str(k): vars(v)
                          for k, v in self.bookmarks.items()},
            "palettes": {k: v.to_dict() for k, v in self.palettes.items()
                         if k not in DEFAULT_PALETTES},
            "tle_sources": self.tle_sources,
            "locations": {k: vars(v) for k, v in self.locations.items()},
            "autogains": {k: vars(v) for k, v in self.autogains.items()},
            "ui_config": self.ui_config,
            "recent": self.recent,
        }
        for name, blob in blobs.items():
            with open(self._path(name), "w") as f:
                json.dump(blob, f, indent=1, sort_keys=True)

    def _load_json(self, name: str) -> Any:
        try:
            with open(self._path(name)) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def load(self) -> None:
        if (d := self._load_json("profiles")) is not None:
            self.profiles = {k: SourceProfile.from_dict(v)
                             for k, v in d.items()}
        if (d := self._load_json("bookmarks")) is not None:
            self.bookmarks = {float(k): Bookmark(**v)
                              for k, v in d.items()}
        if (d := self._load_json("palettes")) is not None:
            for k, v in d.items():
                self.palettes[k] = Palette.from_dict(v)
        if (d := self._load_json("tle_sources")) is not None:
            self.tle_sources.update(d)
        if (d := self._load_json("locations")) is not None:
            self.locations = {k: Location(**v) for k, v in d.items()}
        if (d := self._load_json("autogains")) is not None:
            self.autogains = {k: AutoGain(**v) for k, v in d.items()}
        if (d := self._load_json("ui_config")) is not None:
            self.ui_config = d
        if (d := self._load_json("recent")) is not None:
            self.recent = d
