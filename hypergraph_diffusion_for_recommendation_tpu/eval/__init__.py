from .metrics import metrics_to_host, ranking_metrics


def early_stopping(recall_list: list[float], stopping_steps: int) -> tuple[float, bool]:
    """Stop when Recall has not improved for `stopping_steps` epochs —
    parity with reference util/evaluation.py:195-202."""
    best_recall = max(recall_list)
    best_step = recall_list.index(best_recall)
    should_stop = len(recall_list) - best_step - 1 >= stopping_steps
    return best_recall, should_stop


__all__ = ["ranking_metrics", "metrics_to_host", "early_stopping"]
