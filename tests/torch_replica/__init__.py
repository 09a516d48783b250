"""Pure-torch replica of the reference SiamMOT forward pass.

Composed from the reference's documented semantics (siammot/modelling/*
plus the maskrcnn-benchmark ops it imports, which are unavailable in this
environment) so the JAX framework can be golden-tested end-to-end against
an independent implementation sharing the same weights.  Test fixture
only — never imported by the framework.
"""
