"""`python -m amss_tpu` == `python -m amss_tpu.cli` (== the amss-tpu script)."""

from amss_tpu.cli import main

if __name__ == "__main__":
    main()
