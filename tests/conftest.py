"""Test environment: run on CPU with 8 virtual devices so multi-chip SPMD
logic (mesh shuffles, partial/final aggregation) is exercised without TPU
hardware.

Note: the container's sitecustomize imports jax and registers the 'axon'
TPU backend before this file runs; jax.config.update still wins as long as
no backend has been used yet."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
