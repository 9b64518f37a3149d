"""Flowgraph runtime: block model, graph compiler, streaming executor."""
