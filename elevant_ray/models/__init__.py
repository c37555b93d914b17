"""Vendored tiny models — real learned weights, no external model
libraries (none ship in this container).  See ``tiny_ner``."""
