"""CLI / experiment driver (reference main.py, SURVEY.md #20)."""
