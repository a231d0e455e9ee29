"""jusText classifier parameters (public defaults; Pomikalek 2011).

Defaults mirror the published ``justext`` package defaults, which the
reference harness (`tomazk/Text-Extraction-Evaluation`) used unchanged
for its jusText runs (SURVEY.md Appendix A; BASELINE.json:6).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class JustextParams:
    length_low: int = 70
    length_high: int = 200
    stopwords_low: float = 0.30
    stopwords_high: float = 0.32
    max_link_density: float = 0.2
    max_heading_distance: int = 200
    no_headings: bool = False

    def for_no_stoplist(self) -> "JustextParams":
        """Mode for languages without a stopword list (e.g. zh, which
        has no whitespace tokens): classification falls back to
        length/link-density only — the documented justext usage is to
        pass an empty stoplist with stopwords_low=stopwords_high=0.
        """
        return JustextParams(
            length_low=self.length_low,
            length_high=self.length_high,
            stopwords_low=0.0,
            stopwords_high=0.0,
            max_link_density=self.max_link_density,
            max_heading_distance=self.max_heading_distance,
            no_headings=self.no_headings,
        )


DEFAULT_PARAMS = JustextParams()
