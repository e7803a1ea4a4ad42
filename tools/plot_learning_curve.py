"""Plot a training run's learning curve into experiments/results/.

    python tools/plot_learning_curve.py <run_dir> [out.png]

Reads progress.csv (placement_tpu.utils.metrics format — same columns as
the reference's Ray Tune output) and draws episode_reward_mean plus the
custom wirelength/intersection metrics, the same quantities the reference
plots in docs/source/_figures/rect_pin_rewards_weights.png
(docs/source/usage.rst:414-418).
"""

import pathlib
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from placement_tpu.utils.metrics import read_progress  # noqa: E402


def main():
    run_dir = sys.argv[1]
    out = (sys.argv[2] if len(sys.argv) > 2 else
           str(pathlib.Path(__file__).resolve().parents[1]
               / "experiments/results/learning_curve.png"))
    cols = read_progress(run_dir)
    it = cols["training_iteration"]

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    axes[0].plot(it, cols["episode_reward_mean"])
    axes[0].set_title("episode_reward_mean")
    axes[1].plot(it, cols["custom_metrics/normalized_wirelengths_mean"])
    axes[1].set_title("normalized wirelength (mean)")
    axes[2].plot(it, cols["custom_metrics/num_intersections_mean"])
    axes[2].set_title("intersections (mean)")
    for ax in axes:
        ax.set_xlabel("training iteration")
        ax.grid(alpha=0.3)
    fig.suptitle(pathlib.Path(run_dir).name)
    fig.tight_layout()
    pathlib.Path(out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120)
    print("saved", out)


if __name__ == "__main__":
    main()
