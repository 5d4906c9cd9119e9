"""tokens_ts — a from-scratch PySpark-native time-series rollup engine.

Reimagines rileyhales/geomatics' multidimensional point / bounding-box
time-series extraction (reference: geomatics/timeseries.py, UNVERIFIED —
/root/reference was empty at survey time, see SURVEY.md §0) as a
rollup + downsample + retention pipeline over tables of pre-tokenized
training sequences ``(doc_id, tokens, n_tok, source)``:

- the raster's spatial axes become the token-position axis
  (point / box / mask / full-array extraction, SURVEY.md §2.2-2.3);
- the raster's time axis becomes a per-source event-time grid
  (SURVEY.md §5.3);
- per-time-step statistics become cascading continuous aggregates
  (raw → 1m → 1h → 1d retention tiers, SURVEY.md A2-A5);

plus gap-fill (forward-fill, interior linear interpolation),
Gorilla XOR / delta-of-delta compression as vectorized Arrow UDFs,
explicit salting for skewed sources, and checkpointed resumable jobs
with per-partition lineage — all DataFrame/Catalyst-native.
"""

from tokens_ts import config

__all__ = ["config"]
__version__ = "0.1.0"
