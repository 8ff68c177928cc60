"""JSON-configured scorer with hot reload (X2) — the Spark twin of
``hatef::search::Scorer`` (``src/search_core/Scorer.cpp:10-75`` +
``config/scoring.json``).

Reference semantics, replicated exactly:
* constructor with a path loads the JSON and FALLS BACK to the default
  config on any error (missing file, bad JSON) — ``Scorer::Scorer``,
  Scorer.cpp:14-21;
* ``reload(path)`` RAISES on error (no fallback) — ``Scorer::reload``,
  Scorer.cpp:23-25;
* config = ``field_weights`` (only numeric entries are taken) +
  ``offset_boost`` — ``loadConfig``, Scorer.cpp:39-67;
* defaults: title 2.0, body 1.0, offset_boost 0.1 — ``setDefaultConfig``,
  Scorer.cpp:69-75;
* ``build_args()`` -> ["SCORER", "TFIDF"] — the FT.SEARCH passthrough,
  Scorer.cpp:27-37; here it maps to the engine's ``algorithm="tfidf"``.

``hot_reload()`` adds the watch half the reference leaves to its caller:
re-load when the file's mtime changed. The config is driver-side state —
it parameterizes Catalyst column expressions, so a reload simply builds
the next query's plan with the new constants; executors never hold scorer
state.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass
class ScorerConfig:
    field_weights: dict[str, float] = field(
        default_factory=lambda: {"title": 2.0, "body": 1.0}
    )
    offset_boost: float = 0.1


class JsonScorer:
    def __init__(self, config_path: str | None = None):
        self.config = ScorerConfig()
        self.config_path: str | None = None
        self._mtime: float | None = None
        if config_path is not None:
            try:
                self._load(config_path)
            except Exception:
                self.config = ScorerConfig()  # constructor fallback

    def reload(self, config_path: str | None = None) -> None:
        """Strict reload: raises on unreadable/unparsable config."""
        self._load(config_path or self.config_path)

    def hot_reload(self) -> bool:
        """Reload iff the watched file's mtime changed; True if reloaded."""
        if not self.config_path:
            return False
        mtime = os.stat(self.config_path).st_mtime
        if mtime != self._mtime:
            self._load(self.config_path)
            return True
        return False

    def build_args(self) -> list[str]:
        return ["SCORER", "TFIDF"]

    @property
    def algorithm(self) -> str:
        """The engine-side name ``build_args`` denotes: feed to
        ``SearchEngine.search(..., algorithm=...)``."""
        return "tfidf"

    def _load(self, config_path: str | None) -> None:
        if not config_path:
            raise ValueError("no config path to load")
        with open(config_path) as f:
            raw = json.load(f)
        cfg = ScorerConfig(field_weights={})
        fw = raw.get("field_weights")
        if isinstance(fw, dict):
            for k, v in fw.items():
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    cfg.field_weights[k] = float(v)
        ob = raw.get("offset_boost")
        if isinstance(ob, (int, float)) and not isinstance(ob, bool):
            cfg.offset_boost = float(ob)
        self.config = cfg
        self.config_path = config_path
        self._mtime = os.stat(config_path).st_mtime

    def to_scoring_config(self):
        """Bridge into the fielded reference scorer's weight set: title ->
        title_w, body -> content_w, description/keywords map when present
        (missing fields keep ``ScoringConfig`` defaults)."""
        from search_engine_core_spark.functions.reference_scorer import ScoringConfig

        kw = {}
        m = {
            "title": "title_w",
            "body": "content_w",
            "content": "content_w",
            "description": "description_w",
            "keywords": "keywords_w",
        }
        for k, v in self.config.field_weights.items():
            if k in m:
                kw[m[k]] = v
        return ScoringConfig(**kw)
