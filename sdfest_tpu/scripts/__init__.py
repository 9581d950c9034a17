"""Command-line entry points (train, evaluate, preprocess, benchmark)."""
