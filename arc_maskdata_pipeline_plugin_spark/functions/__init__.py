"""Registered SQL function surface: masking UDFs (reference parity) plus
engine-native helpers. Import ``register_udfs`` and call it once per session.
"""

from .masking import register_udfs  # noqa: F401
