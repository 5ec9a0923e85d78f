"""Audio CNN / R(2+1)D / full-M3F golden parity vs torch-CPU (SURVEY §4).

All torch work happens before any jax dispatch in each test (mixing the two
runtimes mid-stream can deadlock OpenMP in this image), and jax runs under
``default_matmul_precision('highest')`` because this backend's DEFAULT is a
single bf16 pass.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

# Full-size backbone compiles take minutes on this single-core VM; the lean
# default suite skips them (pytest.ini).  Run with:  pytest -m slow
pytestmark = pytest.mark.slow

from m3f.pytorch_tpu.config import AudioNetConfig, ModelConfig, VisualNetConfig
from m3f.pytorch_tpu.models.audio import AudioCNN
from m3f.pytorch_tpu.models.m3f import M3F
from m3f.pytorch_tpu.models.r2plus1d import R2Plus1D, midplanes
from m3f.pytorch_tpu.train.convert import (convert_audio_cnn, convert_m3f,
                                           convert_r2plus1d)
from torch_golden import (AudioCNNGolden, M3FGolden, R2Plus1DGolden,
                          midplanes as torch_midplanes, state_dict_numpy)


def highest():
    return jax.default_matmul_precision("highest")


def test_midplanes_formula_matches():
    for i, o in [(64, 64), (64, 128), (128, 256), (3, 64)]:
        assert midplanes(i, o) == torch_midplanes(i, o)


def test_audio_cnn_parity_eval():
    torch.manual_seed(0)
    tg = AudioCNNGolden().eval()
    sd = state_dict_numpy(tg)
    x = np.random.RandomState(0).randn(3, 1, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(x)).numpy()

    params, state = convert_audio_cnn(sd)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1)[..., 0, :, :][..., None])  # NCHW→NHWC
    xj = jnp.asarray(x[:, 0])  # [B, F, n_mels]; AudioCNN adds channel dim itself
    with highest():
        got, _ = AudioCNN(AudioNetConfig()).apply(params, state, xj, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_audio_cnn_batchnorm_train_stats_match_torch():
    torch.manual_seed(1)
    tg = AudioCNNGolden(channels=(8,), feature_dim=4).train()
    x = np.random.RandomState(1).randn(4, 1, 16, 16).astype(np.float32)
    want = tg(torch.from_numpy(x)).detach().numpy()
    t_mean = tg.bns[0].running_mean.detach().numpy().copy()
    t_var = tg.bns[0].running_var.detach().numpy().copy()
    sd = state_dict_numpy(AudioCNNGolden(channels=(8,), feature_dim=4))
    # rebuild sd from the ORIGINAL (pre-forward) module instead:
    torch.manual_seed(1)
    tg2 = AudioCNNGolden(channels=(8,), feature_dim=4)
    sd = state_dict_numpy(tg2)

    params, state = convert_audio_cnn(sd, num_stages=1)
    cfg = AudioNetConfig(channels=(8,), feature_dim=4)
    with highest():
        got, new_state = AudioCNN(cfg).apply(params, state, jnp.asarray(x[:, 0]),
                                             train=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["bn"][0]["mean"]), t_mean,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["bn"][0]["var"]), t_var,
                               rtol=1e-4, atol=1e-5)


def test_r2plus1d_parity_eval():
    torch.manual_seed(2)
    tg = R2Plus1DGolden().eval()
    sd = state_dict_numpy(tg)
    # small spatial/temporal extent for CPU speed; backbone is fully conv
    x = np.random.RandomState(2).randn(1, 3, 8, 56, 56).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(x)).numpy()

    params, state = convert_r2plus1d(sd)
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # NCDHW → NDHWC
    with highest():
        got, _ = R2Plus1D(VisualNetConfig()).apply(params, state, xj, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("mode", ["3d", "mc3"])
def test_r3d_mc3_parity_eval(mode):
    """r3d_18 / mc3_18 conv families match their torch goldens through the
    auto-detecting converter (SURVEY §2.1 C4 "R(2+1)D/3D-ResNet-style")."""
    torch.manual_seed(11)
    tg = R2Plus1DGolden(conv_mode=mode).eval()
    sd = state_dict_numpy(tg)
    x = np.random.RandomState(11).randn(1, 3, 8, 56, 56).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(x)).numpy()

    params, state = convert_r2plus1d(sd)   # mode auto-detected from keys
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    with highest():
        got, _ = R2Plus1D(VisualNetConfig(conv_mode=mode)).apply(
            params, state, xj, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_m3f_fusion_parity_eval():
    torch.manual_seed(3)
    tg = M3FGolden().eval()
    sd = state_dict_numpy(tg)
    rng = np.random.RandomState(3)
    video = rng.randn(1, 2, 3, 8, 56, 56).astype(np.float32)  # [B,W,C,T,H,W]
    mel = rng.randn(1, 2, 1, 32, 64).astype(np.float32)       # [B,W,1,F,n_mels]
    with torch.no_grad():
        want = tg(torch.from_numpy(video), torch.from_numpy(mel)).numpy()

    params, state = convert_m3f(sd)
    cfg = ModelConfig(compute_dtype="float32", per_frame=False)
    vj = jnp.asarray(video.transpose(0, 1, 3, 4, 5, 2))  # → [B,W,T,H,W,C]
    mj = jnp.asarray(mel[:, :, 0])                       # → [B,W,F,n_mels]
    with highest():
        got, _ = M3F(cfg).apply(params, state, video=vj, mel=mj, train=False)
    assert got.shape == want.shape == (1, 2, 2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)
    # predictions bounded by tanh
    assert (np.abs(np.asarray(got)) <= 1.0).all()


def test_m3f_audio_only_parity_eval():
    torch.manual_seed(4)
    tg = M3FGolden(use_video=False).eval()
    sd = state_dict_numpy(tg)
    rng = np.random.RandomState(4)
    mel = rng.randn(2, 4, 1, 32, 64).astype(np.float32)
    with torch.no_grad():
        want = tg(mel=torch.from_numpy(mel)).numpy()

    params, state = convert_m3f(sd, use_video=False)
    cfg = ModelConfig(use_video=False, compute_dtype="float32", per_frame=False)
    with highest():
        got, _ = M3F(cfg).apply(params, state, mel=jnp.asarray(mel[:, :, 0]),
                                train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_m3f_fusion_parity_per_frame():
    """Per-frame mode (the default): [B, W, L, 2] predictions match the
    identically-extended torch golden (VERDICT r1 missing #1)."""
    torch.manual_seed(5)
    tg = M3FGolden(per_frame=True).eval()
    sd = state_dict_numpy(tg)
    rng = np.random.RandomState(5)
    video = rng.randn(1, 2, 3, 8, 56, 56).astype(np.float32)  # [B,W,C,T,H,W]
    mel = rng.randn(1, 2, 1, 32, 64).astype(np.float32)       # [B,W,1,F,n_mels]
    with torch.no_grad():
        want = tg(torch.from_numpy(video), torch.from_numpy(mel)).numpy()

    params, state = convert_m3f(sd)
    cfg = ModelConfig(compute_dtype="float32", per_frame=True)
    vj = jnp.asarray(video.transpose(0, 1, 3, 4, 5, 2))
    mj = jnp.asarray(mel[:, :, 0])
    with highest():
        got, _ = M3F(cfg).apply(params, state, video=vj, mel=mj, train=False)
    assert got.shape == want.shape == (1, 2, 8, 2)  # per-FRAME granularity
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_m3f_audio_only_parity_per_frame():
    torch.manual_seed(6)
    tg = M3FGolden(use_video=False, per_frame=True, frames_per_window=16).eval()
    sd = state_dict_numpy(tg)
    rng = np.random.RandomState(6)
    mel = rng.randn(2, 3, 1, 32, 64).astype(np.float32)
    with torch.no_grad():
        want = tg(mel=torch.from_numpy(mel)).numpy()

    params, state = convert_m3f(sd, use_video=False)
    cfg = ModelConfig(use_video=False, compute_dtype="float32",
                      per_frame=True, frames_per_window=16)
    with highest():
        got, _ = M3F(cfg).apply(params, state, mel=jnp.asarray(mel[:, :, 0]),
                                train=False)
    assert got.shape == want.shape == (2, 3, 16, 2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_r2plus1d_34_parity_eval():
    """Depth-34 recipe (blocks 3-4-6-3): the converter must index torchvision
    ``layer{s}.{b}`` names correctly across UNEVEN stage lengths (SURVEY §3.4
    leaves 18-vs-34 unverified; both are supported via blocks_per_stage)."""
    torch.manual_seed(7)
    blocks = (3, 4, 6, 3)
    tg = R2Plus1DGolden(blocks=blocks).eval()
    sd = state_dict_numpy(tg)
    x = np.random.RandomState(7).randn(1, 3, 4, 28, 28).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(x)).numpy()

    params, state = convert_r2plus1d(sd, blocks_per_stage=blocks)
    cfg = VisualNetConfig(blocks_per_stage=blocks)
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    with highest():
        got, _ = R2Plus1D(cfg).apply(params, state, xj, train=False)
    assert len(params["blocks"]) == sum(blocks)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_r2plus1d_se_parity_eval():
    """Flag-gated squeeze-excitation side branch (SURVEY §3.4 "2D-SE side
    branch — must be re-verified"): golden schema layer{s}.{b}.se.0/.se.2."""
    torch.manual_seed(8)
    blocks, channels = (1, 1), (64, 128)
    tg = R2Plus1DGolden(channels=channels, blocks=blocks, se_ratio=4).eval()
    sd = state_dict_numpy(tg)
    assert any(".se.0.weight" in k for k in sd)
    x = np.random.RandomState(8).randn(2, 3, 4, 28, 28).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(x)).numpy()

    params, state = convert_r2plus1d(sd, blocks_per_stage=blocks)
    cfg = VisualNetConfig(block_channels=channels, blocks_per_stage=blocks,
                          feature_dim=channels[-1], se_ratio=4)
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    with highest():
        got, _ = R2Plus1D(cfg).apply(params, state, xj, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)

    # roundtrip: export back to torch schema and compare arrays
    from m3f.pytorch_tpu.train.convert import export_r2plus1d
    out = export_r2plus1d(params, state, blocks_per_stage=blocks)
    for k, v in sd.items():
        if "num_batches_tracked" in k:
            continue
        np.testing.assert_allclose(out[k], v, rtol=1e-6,
                                   err_msg=f"roundtrip mismatch at {k}")


def test_m3f_gradient_parity_training_mode():
    """FULL training-semantics parity: same weights, same batch, same masked
    CCC loss — torch autograd and jax.grad must agree (BN in train mode, so
    the batch-statistics backward path is exercised). Backs the [B:5] "CCC
    within 1e-3 of the reference" claim at the TRAINING level.

    Methodology: the deepest gradients are inherently ill-conditioned at
    fp32 (18 BN-backward cancellation layers) — torch's OWN fp32 stem
    gradient is ~7e-3 relative off its fp64 truth (measured). So torch-fp64
    is the ground truth, and jax-fp32 must land within 4x of torch-fp32's
    own distance from it; well-conditioned leaves also get an absolute
    2e-3 agreement check. Runs with bn_two_pass=True (torch's variance
    order; the default one-pass stats add another ~2x drift at depth —
    see nn.BatchNorm.two_pass)."""
    B, W, L = 1, 2, 8
    rng = np.random.RandomState(9)
    video = rng.randn(B, W, 3, L, 56, 56).astype(np.float32)
    mel = rng.randn(B, W, 1, 32, 64).astype(np.float32)
    labels = rng.uniform(-1, 1, (B, W, L, 2)).astype(np.float32)
    mask = rng.rand(B, W, L) > 0.25  # some invalid frames

    def torch_ccc_loss(pred, target, m):
        m = m[..., None].to(pred.dtype).expand_as(target)
        pred = pred.reshape(-1, 2)
        target = target.reshape(-1, 2)
        m = m.reshape(-1, 2)
        cnt = m.sum(0).clamp_min(1e-12)
        mu_p = (pred * m).sum(0) / cnt
        mu_t = (target * m).sum(0) / cnt
        dp, dt = pred - mu_p, target - mu_t
        cov = (dp * dt * m).sum(0) / cnt
        var_p = (dp * dp * m).sum(0) / cnt
        var_t = (dt * dt * m).sum(0) / cnt
        ccc = 2 * cov / (var_p + var_t + (mu_p - mu_t) ** 2 + 1e-8)
        return 1.0 - ccc.mean()

    def torch_run(dtype):
        torch.manual_seed(9)
        tg = M3FGolden(per_frame=True).train().to(dtype)
        loss = torch_ccc_loss(
            tg(torch.from_numpy(video).to(dtype),
               torch.from_numpy(mel).to(dtype)),
            torch.from_numpy(labels).to(dtype), torch.from_numpy(mask))
        loss.backward()
        grads = {
            "head.kernel": tg.head.weight.grad.numpy().T,
            "gru.fwd.w_ih": tg.gru.weight_ih_l0.grad.numpy().T,
            "gru.bwd.w_hh": tg.gru.weight_hh_l0_reverse.grad.numpy().T,
            "stem.conv1": tg.visual.stem[0].weight.grad.numpy()
                          .transpose(2, 3, 4, 1, 0),
            "audio.conv0": tg.audio.convs[0].weight.grad.numpy()
                           .transpose(2, 3, 1, 0),
            "blk0.bn1.scale": tg.visual.layer1[0].conv1[1].weight.grad.numpy(),
        }
        return tg, float(loss.detach()), grads

    _, loss32, g32 = torch_run(torch.float32)
    _, loss64, g64 = torch_run(torch.float64)
    torch.manual_seed(9)  # same init as torch_run
    sd = state_dict_numpy(M3FGolden(per_frame=True))

    # ---- jax fp32 with converted weights + identical loss
    from m3f.pytorch_tpu.config import AudioNetConfig as ANC
    from m3f.pytorch_tpu.ops.ccc import ccc_loss

    params, state = convert_m3f(sd)
    cfg = ModelConfig(compute_dtype="float32", per_frame=True,
                      audio=ANC(bn_two_pass=True),
                      visual=VisualNetConfig(bn_two_pass=True))
    model = M3F(cfg)
    vj = jnp.asarray(video.transpose(0, 1, 3, 4, 5, 2))
    mj = jnp.asarray(mel[:, :, 0])

    def loss_fn(p):
        preds, _ = model.apply(p, state, video=vj, mel=mj, train=True)
        return ccc_loss(preds, jnp.asarray(labels), jnp.asarray(mask))

    with highest():
        j_loss, grads = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(j_loss), loss64, rtol=1e-4,
                               err_msg="loss mismatch vs fp64 truth")

    jmap = {
        "head.kernel": grads["head"]["kernel"],
        "gru.fwd.w_ih": grads["gru"]["layers"][0]["fwd"]["w_ih"],
        "gru.bwd.w_hh": grads["gru"]["layers"][0]["bwd"]["w_hh"],
        "stem.conv1": grads["visual"]["stem"]["conv1"]["kernel"],
        "audio.conv0": grads["audio"]["conv"][0]["kernel"],
        "blk0.bn1.scale": grads["visual"]["blocks"][0]["bn1"]["scale"],
    }
    well_conditioned = {"head.kernel", "gru.fwd.w_ih", "gru.bwd.w_hh",
                        "audio.conv0"}
    for name, truth in g64.items():
        scale = np.abs(truth).max() + 1e-12
        err_torch32 = np.abs(g32[name] - truth).max()
        err_jax = np.abs(np.asarray(jmap[name], np.float64) - truth).max()
        # floor: where torch's own fp32 error is near machine noise the 4x
        # ratio is meaningless — allow up to 2e-4 relative outright (the
        # absolute 2e-3 check below still binds the well-conditioned leaves)
        floor = 5e-5 * scale
        assert err_jax <= 4.0 * max(err_torch32, floor), (
            f"{name}: jax fp32 error {err_jax:.3e} exceeds 4x torch fp32's "
            f"own error {err_torch32:.3e} from the fp64 truth (scale {scale:.3e})")
        if name in well_conditioned:
            np.testing.assert_allclose(
                np.asarray(jmap[name]), g64[name], rtol=2e-3, atol=2e-3 * scale,
                err_msg=f"gradient mismatch at {name}")


def test_m3f_two_layer_gru_parity_autodetect():
    """2-layer BiGRU model imports with NO layer-count flag (convert_m3f
    auto-detects from weight_ih_l{k} keys) and matches the torch golden."""
    torch.manual_seed(10)
    tg = M3FGolden(use_video=False, num_layers=2, per_frame=True,
                   frames_per_window=16).eval()
    sd = state_dict_numpy(tg)
    rng = np.random.RandomState(10)
    mel = rng.randn(2, 3, 1, 32, 64).astype(np.float32)
    with torch.no_grad():
        want = tg(mel=torch.from_numpy(mel)).numpy()

    params, state = convert_m3f(sd, use_video=False)  # layers auto-detected
    assert len(params["gru"]["layers"]) == 2
    from m3f.pytorch_tpu.config import GRUConfig
    cfg = ModelConfig(use_video=False, compute_dtype="float32",
                      per_frame=True, frames_per_window=16,
                      gru=GRUConfig(num_layers=2))
    with highest():
        got, _ = M3F(cfg).apply(params, state, mel=jnp.asarray(mel[:, :, 0]),
                                train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
