"""End-to-end learning demo (run 1: loss 5126->1534 over 120 epochs;
latent class accuracy 1.00 from every subset; text->PA conditional
generation places the class band with accuracy 1.00 vs 0.33 chance): structured tri-modal data -> train MoPoE ->
latent lr-eval accuracy + cross-modal conditional coherence must rise
well above chance."""
import sys, time
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/mopoe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
t0=time.time()
def log(*a): print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)
from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
from mopoe_mimic_tpu.data.loader import BatchLoader
from mopoe_mimic_tpu.train import create_train_state, make_train_step
from mopoe_mimic_tpu.models.mmvae import MMVae

cfg = MopoeConfig(method="joint_elbo", dataset="testing", img_size=64, DIM_img=16,
                  DIM_text=16, class_dim=16, text_encoding="word", vocab_size=10,
                  batch_size=64, initial_learning_rate=1e-4, donate_state=True, seed=0)
ds = SyntheticMimic(cfg, seed=0, length=256, structured=True)
loader = BatchLoader(ds, cfg.batch_size, shuffle=True, seed=0)
b0 = next(iter(loader))[0]
state = create_train_state(cfg, jax.random.PRNGKey(0), b0)
step = make_train_step(cfg)
for epoch in range(120):
    loader.set_epoch(epoch)
    for batch, _ in loader:
        state, m = step(state, batch)
    if epoch % 20 == 0:
        log(f"epoch {epoch}: loss {float(m['total_loss']):.1f}")
log(f"final loss {float(m['total_loss']):.1f}")

# latent separability: subset means should classify the latent class
model = MMVae(cfg)
@jax.jit
def infer(params, bs, batch):
    out = model.apply({"params": params, "batch_stats": bs}, batch, train=False,
                      method=lambda mo, b, train: mo.inference(b, train=train))
    return {k: mu for k, (mu, lv) in out["subsets"].items()}

all_b = {k: v for k, v in ds.arrays.items()}
means = jax.device_get(infer(state.params, state.batch_stats,
                             {k: v[:256] for k, v in all_b.items()}))
classes = ds.classes[:256]
from sklearn.linear_model import LogisticRegression
for key in ("PA", "text", "Lateral_PA_text"):
    X = np.nan_to_num(means[key])
    clf = LogisticRegression(max_iter=500).fit(X[:192], classes[:192])
    acc = clf.score(X[192:], classes[192:])
    log(f"latent class accuracy from subset {key}: {acc:.2f} (chance 0.33)")

# cross-modal generation: condition on text only, check PA band position
@jax.jit
def cond_from_text(params, bs, batch, r):
    def go(mo, b, train):
        latents = mo.inference(b, train=train)
        return mo.cond_generation({"text": latents["subsets"]["text"]}, train=train)
    return model.apply({"params": params, "batch_stats": bs}, batch,
                       train=False, rngs={"reparam": r}, method=go)
text_only = {"text": all_b["text"][:64]}
gen = jax.device_get(cond_from_text(state.params, state.batch_stats, text_only,
                                    jax.random.PRNGKey(5)))
pa = np.nan_to_num(gen["text"]["PA"])  # [64, 64, 64, 1]
band = 64 // 4
correct = 0
for i in range(64):
    row_mass = pa[i, :, :, 0].mean(axis=1)
    pred_band = int(np.argmax([row_mass[c*band+band//2 : c*band+band+band//2].mean() for c in range(3)]))
    correct += int(pred_band == int(ds.classes[i]))
log(f"text->PA conditional band accuracy: {correct/64:.2f} (chance 0.33)")
