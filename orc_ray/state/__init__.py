"""Checkpoint/manifest state helpers."""
