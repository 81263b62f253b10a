"""Driver entry point — delegates to the packaged benchmark CLI
(`raytracinginoneweekendincuda_tpu/utils/benchmark.py`, also installed as
``rtow-bench``).  Prints ONE JSON line: {"metric", "value", "unit",
"vs_baseline"}."""

from raytracinginoneweekendincuda_tpu.utils.benchmark import main

if __name__ == "__main__":
    raise SystemExit(main())
