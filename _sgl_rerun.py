import time, jax
import hypergraph_diffusion_for_recommendation_tpu.data.device as devmod
devmod.PALLAS_BF16 = True
from hypergraph_diffusion_for_recommendation_tpu.core import make_config
from hypergraph_diffusion_for_recommendation_tpu.data import (build_cf_device_data, build_interaction,
    synthetic_dataset, apply_experiment)
from hypergraph_diffusion_for_recommendation_tpu.models import build_model
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer
base_train, base_test, _ = synthetic_dataset(n_users=1890, n_items=4000, n_clusters=64, mean_degree=45.0, seed=7)
for exp, ekw in (("full", {}), ("missing", dict(missing_pct=10)), ("add_noise", dict(noise_pct=10))):
    tr_pairs, te_pairs = apply_experiment(base_train, base_test, exp, seed=0, **ekw)
    inter = build_interaction(tr_pairs, te_pairs)
    cf = build_cf_device_data(inter, eval_user_multiple=512)
    cfg = make_config("SGL", batch_size=2048, item_ranking=(10,20,40), eval_user_batch=512,
                      max_epoch=40, early_stopping_steps=15, experiment=exp, **ekw,
                      lrate=0.05, embedding_size=64, reg=0.01, cl_rate=0.05, temp=0.2, drop_rate=0.1)
    t0=time.time()
    r = Trainer(build_model(cfg, cf)).fit(quiet=True)
    print(f"{exp:10s} SGL recall@20 {r.best_metrics['recall']:.5f} ndcg@20 {r.best_metrics['ndcg']:.5f} (ep {r.best_epoch}, {time.time()-t0:.0f}s)", flush=True)
