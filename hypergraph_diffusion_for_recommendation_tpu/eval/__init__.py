from .metrics import metrics_to_host, ranking_metrics


def early_stopping(
    recall_list: list[float], stopping_steps: int, smooth: int = 1
) -> tuple[float, bool]:
    """Stop when Recall has not improved for `stopping_steps` epochs —
    parity with reference util/evaluation.py:195-202 at smooth=1.

    smooth>1 runs the same patience rule on a trailing moving average of
    width `smooth`: a single noisy recall spike then can't anchor `best`
    early and time out patience while the underlying trajectory is still
    climbing (the HCCF/SHT plateau-lottery failure mode — PARITY_RUNS.md
    outlier notes). Only the stop DECISION changes; best-model selection
    stays on raw per-epoch metrics. Note the stop may fire earlier OR
    later than the raw rule (a smoothed series can peak before the raw
    one), so the guarantee is only about which checkpoint is selected,
    not about how long training runs. A/B evidence:
    scripts/stopping_rule_ab.py (measured no-op on the parity protocol).
    """
    if smooth > 1:
        sig = [
            sum(recall_list[max(0, i - smooth + 1): i + 1])
            / (i + 1 - max(0, i - smooth + 1))
            for i in range(len(recall_list))
        ]
    else:
        sig = recall_list
    best = max(sig)
    best_step = sig.index(best)
    should_stop = len(sig) - best_step - 1 >= stopping_steps
    return best, should_stop


__all__ = ["ranking_metrics", "metrics_to_host", "early_stopping"]
