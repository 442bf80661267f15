"""Benchmark harness (successor of the reference's ``run-samples.sh``)."""
