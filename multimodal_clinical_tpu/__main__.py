"""``python -m multimodal_clinical_tpu --dir <benchmark>`` — same CLI as
repo-root main.py, available once the package is on the path."""

from .utils.cache import enable_persistent_cache

enable_persistent_cache()

from .benchmarks import get_benchmark  # noqa: E402
from .config import setup_configs  # noqa: E402
from .engine.run import run_benchmark  # noqa: E402


def run_training(argv=None):
    args = setup_configs(argv)
    benchmark = get_benchmark(args.dir)
    num_seeds = int(getattr(args, "num_seeds", 1) or 1)
    if num_seeds > 1:
        from .engine.multiseed import run_multiseed

        seeds = list(range(int(args.seed), int(args.seed) + num_seeds))
        summary = run_multiseed(args, benchmark, seeds)
    else:
        summary = run_benchmark(args, benchmark,
                                profile_dir=getattr(args, "profile_dir",
                                                    None))
    print({k: round(v, 4) for k, v in summary.items()})
    return summary


if __name__ == "__main__":
    run_training()
