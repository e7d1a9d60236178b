"""Compute primitives: fused RNN scans, masked attention, audio features, noise mixing."""
