"""``python -m piccolo_tpu`` — the CLI entry point (same as main.py).

Mirrors the reference's ``python main.py --config ... --log ...`` surface
(reference main.py:10-68) at the package level.
"""

from .main import main

if __name__ == "__main__":
    main()
