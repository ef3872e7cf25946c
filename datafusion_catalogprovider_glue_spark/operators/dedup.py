"""Placeholder — filled in by the extension-operator milestone."""
