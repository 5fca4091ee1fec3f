"""Training: optax loops reproducing the reference's losses (SURVEY.md §3.4)."""
