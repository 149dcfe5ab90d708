"""Grid-sweep runner (wandb-free parity with the reference's sweep.yml)."""
import itertools, json, sys

sys.path.insert(0, ".")

def main(path="scripts/sweep.yml"):
    import yaml  # pyyaml is available via flax deps
    with open(path) as f:
        spec = yaml.safe_load(f)
    from hypergraph_diffusion_for_recommendation_tpu import cli
    keys = list(spec["grid"])
    results = []
    for combo in itertools.product(*(spec["grid"][k] for k in keys)):
        overrides = dict(zip(keys, combo))
        cfg = cli.build_config(cli.parse_args([f"--model={spec['model']}", f"--dataset={spec['dataset']}", "--quiet"]))
        cfg = cfg.replace(**overrides)
        r = cli.run(cfg, quiet=True)
        results.append({**overrides, "recall": r.best_metrics.get("recall")})
        print(json.dumps(results[-1]))
    return results

if __name__ == "__main__":
    main(*sys.argv[1:])
