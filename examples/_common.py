"""Shared example plumbing: --cpu flag, default test images."""

from __future__ import annotations

import argparse
import os


DOG_JPEG = "/root/reference/tests/data/dog.jpeg"
APRILTAG_JPG = "/root/reference/tests/data/apriltags_tag36h11.jpg"


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (skip the TPU tunnel)")
    return p


def configure_backend(args) -> None:
    """Must run before the first jax use."""
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
