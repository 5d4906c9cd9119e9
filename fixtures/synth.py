"""Thin shim: the deterministic fixture generator lives in
tokens_ts.synth so it ships inside tokens_ts.zip for --py-files.
SURVEY.md §7.1 names this path; both import paths work."""

from tokens_ts.synth import sequences, write_sequences  # noqa: F401
