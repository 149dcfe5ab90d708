"""Model-comparison quality run on a learnable mid-size synthetic."""
import time, jax, sys
import hypergraph_diffusion_for_recommendation_tpu.data.device as devmod
devmod.PALLAS_BF16 = True
from hypergraph_diffusion_for_recommendation_tpu.core import make_config
from hypergraph_diffusion_for_recommendation_tpu.data import (build_cf_device_data, build_interaction,
    build_kg_device_data, build_knowledge, synthetic_dataset)
from hypergraph_diffusion_for_recommendation_tpu.models import build_model
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

train, test, kg_df = synthetic_dataset(n_users=1890, n_items=4000, n_clusters=64,
                                       mean_degree=45.0, seed=7, with_kg=True)
inter = build_interaction(train, test)
kg = build_knowledge(kg_df, inter)
cf_dev = build_cf_device_data(inter, eval_user_multiple=512)
kg_dev = build_kg_device_data(kg)
print(f"data: {inter.n_users}u {inter.n_items}i {inter.n_cf_train} train edges", flush=True)

RUNS = [
    ("MF", 60, dict(lrate=0.01, embedding_size=64, reg=0.1)),
    ("LightGCN", 60, dict(lrate=0.005, embedding_size=64, reg=0.1)),
    ("HCCF", 60, dict(lrate=0.001, embedding_size=64, hyper_dim=128, drop_rate=0.3, cl_rate=1e-4, temp=0.2)),
    ("HGNN_HD3", 60, dict(lrate=0.01, hyper_dim=64, cl_rate=1e-5, temp=0.2, reg=0.1, drop_rate=0.2, mode="full")),
    ("KHGRec", 40, dict(lrate=0.001, hyper_dim=64, relation_dim=32, temp=1.0, cl_rate=0.01, drop_rate=0.2, mode="full", batch_size_kg=8192)),
]
for name, epochs, kw in RUNS:
    cfg = make_config(name, batch_size=2048, item_ranking=(10,20,40), eval_user_batch=512,
                      max_epoch=epochs, early_stopping_steps=epochs, **kw)
    tr = Trainer(build_model(cfg, cf_dev, kg_dev if cfg.use_knowledge else None))
    t0=time.time()
    r = tr.fit(quiet=True)
    print(f"{name}: best recall@20 {r.best_metrics['recall']:.5f} ndcg@20 {r.best_metrics['ndcg']:.5f} "
          f"(ep {r.best_epoch}, {r.examples_per_sec:,.0f} ex/s, total {time.time()-t0:.0f}s)", flush=True)
