"""Deterministic extraction core: markdown emitter (zerox output dialect),
fence post-processing, pseudo-PDF layout pass, page semantics."""
