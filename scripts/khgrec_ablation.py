"""KHGRec mode ablation on the learnable synthetic: does the KG/SSL help?"""
import sys

sys.path.insert(0, ".")
import time, jax
import hypergraph_diffusion_for_recommendation_tpu.data.device as devmod
devmod.PALLAS_BF16 = True
from hypergraph_diffusion_for_recommendation_tpu.core import make_config
from hypergraph_diffusion_for_recommendation_tpu.data import (build_cf_device_data, build_interaction,
    build_kg_device_data, build_knowledge, synthetic_dataset)
from hypergraph_diffusion_for_recommendation_tpu.models import build_model
from hypergraph_diffusion_for_recommendation_tpu.train import Trainer
train, test, kg_df = synthetic_dataset(n_users=1890, n_items=4000, n_clusters=64, mean_degree=45.0, seed=7, with_kg=True)
inter = build_interaction(train, test)
kg = build_knowledge(kg_df, inter)
cf_dev = build_cf_device_data(inter, eval_user_multiple=512)
kg_dev = build_kg_device_data(kg)
for mode in ("full", "wossl", "woglobal"):
    cfg = make_config("KHGRec", batch_size=2048, batch_size_kg=8192, hyper_dim=64, relation_dim=32,
                      item_ranking=(10,20,40), eval_user_batch=512, max_epoch=60, early_stopping_steps=20,
                      lrate=0.001, temp=1.0, cl_rate=0.01, drop_rate=0.2, mode=mode)
    t0=time.time()
    r = Trainer(build_model(cfg, cf_dev, kg_dev)).fit(quiet=True)
    print(f"KHGRec mode={mode:10s} recall@20 {r.best_metrics['recall']:.5f} ndcg@20 {r.best_metrics['ndcg']:.5f} (ep {r.best_epoch}, {time.time()-t0:.0f}s)", flush=True)
