"""Utilities: reference-format binary IO, status messages, monitors."""

from . import errors, io

__all__ = ["errors", "io"]
