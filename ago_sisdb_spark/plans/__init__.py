"""User-facing query API compiling reference-style requests into
DataFrame plans."""
