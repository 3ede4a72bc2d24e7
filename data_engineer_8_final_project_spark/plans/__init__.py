"""Physical-plan introspection (scale-discipline assertions)."""
