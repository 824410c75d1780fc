"""Dev/validation harness scripts (the reference's notebooks/ equivalent).

Run from the repo root as modules so the package resolves without install:

    python -m examples.dev_model --out /tmp/dev
    python -m examples.convergence_synthetic

(or ``pip install -e .`` once and run the files directly.)
"""
