"""Training-dynamics parity: our engine vs a torch replica of the reference
loop on IDENTICAL data.

The real-data accuracy targets (BASELINE.md) need the datasets on disk; this
is the strongest available proxy: the reference's own LeNet FusionNet
(imported read-only from /root/reference) trained with the reference's
optimizer/loss semantics, against our AVMnistFusionNet + jlogits step
factory, on the same synthetic tensors — final accuracies must agree within
run-to-run noise (the parity spec, SURVEY §7)."""

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest
import torch

REFERENCE = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REFERENCE),
                       reason="reference checkout not present"),
]


def _load_reference_lenet():
    sys.path.insert(0, os.path.join(REFERENCE, "avmnist"))
    for name in ("pytorch_lightning", "torchvision", "torchvision.models"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["pytorch_lightning"].LightningModule = object
    sys.modules.pop("joint_model", None)  # evict another dir's cached module
    try:
        import joint_model as ref_joint  # type: ignore
    finally:
        sys.modules.pop("joint_model", None)
        sys.path.pop(0)
    return ref_joint


def _make_data(n_train=512, n_test=128, num_classes=10, seed=0):
    from multimodal_clinical_tpu.data.synthetic import make_synthetic_dataset

    shapes = [(28, 28, 1), (28, 28, 1)]  # small twin for CPU-torch speed
    train = make_synthetic_dataset("avmnist", n_train, num_classes,
                                   seed=seed, dirs_seed=seed, shapes=shapes)
    test = make_synthetic_dataset("avmnist", n_test, num_classes,
                                  seed=seed + 1, dirs_seed=seed,
                                  shapes=shapes)
    return train, test


def _torch_accuracy(net, x1, x2, labels):
    with torch.no_grad():
        l1, l2, avg, _ = net(x1, x2, labels)
    return float((avg.argmax(1) == labels).float().mean())


def test_jlogits_training_dynamics_match_reference(tmp_path):
    num_classes, batch, epochs, lr = 10, 32, 4, 0.05
    train, test = _make_data(num_classes=num_classes)

    # ---------------- torch reference loop ----------------
    ref_joint = _load_reference_lenet()
    torch.manual_seed(0)

    class RefNet(torch.nn.Module):
        """Reference FusionNet geometry with both towers LeNet(6,3) (our
        synthetic twin uses 28x28 for both modalities for CPU speed)."""

        def __init__(self):
            super().__init__()
            self.x1_model = ref_joint.LeNet(1, 6, 3)
            self.x2_model = ref_joint.LeNet(1, 6, 3)
            self.classifier_x1 = torch.nn.Linear(48, num_classes)
            self.classifier_x2 = torch.nn.Linear(48, num_classes)
            self.loss_fn = torch.nn.CrossEntropyLoss()

        def forward(self, x1, x2, label):
            h1 = torch.relu(self.x1_model(x1))
            h2 = torch.relu(self.x2_model(x2))
            l1 = self.classifier_x1(h1)
            l2 = self.classifier_x2(h2)
            avg = (l1 + l2) / 2
            return l1, l2, avg, self.loss_fn(avg, label)

    net = RefNet()
    opt = torch.optim.SGD(net.parameters(), lr=lr)  # legacy plain SGD
    tx1 = torch.tensor(train.modalities[0].transpose(0, 3, 1, 2))
    tx2 = torch.tensor(train.modalities[1].transpose(0, 3, 1, 2))
    ty = torch.tensor(train.labels.astype(np.int64))
    order_rng = np.random.default_rng(0)
    net.train()
    for _ in range(epochs):
        order = order_rng.permutation(len(ty))
        for start in range(0, len(ty), batch):
            idx = order[start:start + batch]
            opt.zero_grad()
            _, _, _, loss = net(tx1[idx], tx2[idx], ty[idx])
            loss.backward()
            opt.step()
    net.eval()
    torch_acc = _torch_accuracy(
        net,
        torch.tensor(test.modalities[0].transpose(0, 3, 1, 2)),
        torch.tensor(test.modalities[1].transpose(0, 3, 1, 2)),
        torch.tensor(test.labels.astype(np.int64)),
    )

    # ---------------- our engine ----------------
    from multimodal_clinical_tpu.engine.run import (
        DataBundle, build_loaders, init_state_on_mesh,
    )
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.trainer import Trainer
    from multimodal_clinical_tpu.models.zoo import AVMnistFusionNet
    from multimodal_clinical_tpu.parallel.mesh import make_mesh
    from flax import linen as nn
    import jax.numpy as jnp

    class SmallAVNet(nn.Module):
        """Our AVMnist net with the second tower shrunk to match RefNet."""

        num_classes: int

        @nn.compact
        def __call__(self, x1, x2, train=True):
            from multimodal_clinical_tpu.models.common import TorchDense
            from multimodal_clinical_tpu.models.lenet import LeNet

            h1 = nn.relu(LeNet(6, 3, name="x1_model")(x1, train))
            h2 = nn.relu(LeNet(6, 3, name="x2_model")(x2, train))
            l1 = TorchDense(self.num_classes, name="classifier_x1")(h1)
            l2 = TorchDense(self.num_classes, name="classifier_x2")(h2)
            return {"logits": [l1, l2]}

    args = SimpleNamespace(
        num_classes=num_classes, batch_size=batch, learning_rate=lr,
        num_epochs=epochs, use_wandb=False, group_name="parity", seed=0,
        use_scheduler=False, mesh_shape=None, ckpt_dir=str(tmp_path),
        log_every_n_steps=0, data_path=str(tmp_path),
    )
    data = DataBundle(train, test, test, train_sampler="random",
                      synthetic=True)
    mesh = make_mesh()
    spec = ModelSpec(module=SmallAVNet(num_classes=num_classes))
    loaders = build_loaders(args, data, mesh)
    state = init_state_on_mesh(spec, args, data, mesh,
                               {"momentum": 0.0, "weight_decay": 0.0})
    trainer = Trainer(args, spec, state, *loaders)
    trainer.fit()
    ours_acc = trainer.test(restore_best=False)["test_epoch/test_avg_acc"]

    # both learn the planted signal, and agree within run-to-run noise
    assert torch_acc > 0.5, torch_acc
    assert ours_acc > 0.5, ours_acc
    assert abs(torch_acc - ours_acc) < 0.15, (torch_acc, ours_acc)


def test_jlogits_exact_trajectory_with_ported_init(tmp_path):
    """Same initial weights (ported from torch), same data order, same
    optimizer: per-epoch losses must track the torch reference loop to
    float-rounding scale — trajectory-level parity, not just endpoint."""
    num_classes, batch, epochs, lr = 10, 32, 2, 0.05
    train, test = _make_data(n_train=256, num_classes=num_classes)

    ref_joint = _load_reference_lenet()
    torch.manual_seed(7)

    class RefNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.x1_model = ref_joint.LeNet(1, 6, 3)
            self.x2_model = ref_joint.LeNet(1, 6, 3)
            self.classifier_x1 = torch.nn.Linear(48, num_classes)
            self.classifier_x2 = torch.nn.Linear(48, num_classes)
            self.loss_fn = torch.nn.CrossEntropyLoss()

        def forward(self, x1, x2, label):
            l1 = self.classifier_x1(torch.relu(self.x1_model(x1)))
            l2 = self.classifier_x2(torch.relu(self.x2_model(x2)))
            avg = (l1 + l2) / 2
            return l1, l2, avg, self.loss_fn(avg, label)

    net = RefNet()
    opt = torch.optim.SGD(net.parameters(), lr=lr)
    tx1 = torch.tensor(train.modalities[0].transpose(0, 3, 1, 2))
    tx2 = torch.tensor(train.modalities[1].transpose(0, 3, 1, 2))
    ty = torch.tensor(train.labels.astype(np.int64))
    net.train()
    torch_epoch_losses = []
    for _ in range(epochs):
        losses = []
        for start in range(0, len(ty), batch):  # sequential order
            sl = slice(start, start + batch)
            opt.zero_grad()
            _, _, _, loss = net(tx1[sl], tx2[sl], ty[sl])
            loss.backward()
            opt.step()
            losses.append(float(loss))
        torch_epoch_losses.append(float(np.mean(losses)))

    # ---- our engine, initialized from the SAME torch weights ----
    import jax
    import jax.numpy as jnp

    from multimodal_clinical_tpu.data.loader import Loader
    from multimodal_clinical_tpu.data.sampler import SequentialSampler
    from multimodal_clinical_tpu.engine.metrics import EpochAccumulator
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models import torch_port
    from flax import linen as nn

    class SmallAVNet(nn.Module):
        num_classes: int

        @nn.compact
        def __call__(self, x1, x2, train=True):
            from multimodal_clinical_tpu.models.common import TorchDense
            from multimodal_clinical_tpu.models.lenet import LeNet

            h1 = nn.relu(LeNet(6, 3, name="x1_model")(x1, train))
            h2 = nn.relu(LeNet(6, 3, name="x2_model")(x2, train))
            l1 = TorchDense(self.num_classes, name="classifier_x1")(h1)
            l2 = TorchDense(self.num_classes, name="classifier_x2")(h2)
            return {"logits": [l1, l2]}

    args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                           learning_rate=lr, num_epochs=epochs,
                           use_scheduler=False, seed=0)
    spec = ModelSpec(module=SmallAVNet(num_classes=num_classes))
    sample = [jnp.asarray(train.modalities[0][:2]),
              jnp.asarray(train.modalities[1][:2])]
    state = create_train_state(spec, args, jax.random.PRNGKey(0), sample,
                               steps_per_epoch=8, momentum=0.0,
                               weight_decay=0.0)

    # port the torch initialization into the live state (torch_eval state
    # dict was mutated by training — rebuild a fresh net with same seed)
    torch.manual_seed(7)
    fresh = RefNet()
    sd = fresh.state_dict()
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for tower in ("x1_model", "x2_model"):
        p, st = torch_port.port_lenet(sd, num_blocks=4, prefix=f"{tower}.")
        params[tower] = p
        stats[tower] = st
    for head in ("classifier_x1", "classifier_x2"):
        params[head] = torch_port.port_torch_linear(
            sd[f"{head}.weight"], sd[f"{head}.bias"])
    state = state.replace(params=params, batch_stats=stats)

    loader = Loader(train, batch, SequentialSampler(len(train)))
    step = make_train_step(spec)
    ours_epoch_losses = []
    for _ in range(epochs):
        acc = EpochAccumulator()
        for b in loader:
            state, metrics = step(state, b)
            acc.append(metrics)
        ours_epoch_losses.append(acc.summary()["train_loss"])

    for t_loss, o_loss in zip(torch_epoch_losses, ours_epoch_losses):
        assert abs(t_loss - o_loss) < 5e-3, (torch_epoch_losses,
                                             ours_epoch_losses)


def test_ogm_trajectory_matches_reference_code(tmp_path):
    """OGM ('OGM' mode — deterministic, no noise) trajectory parity: the
    torch loop uses the REFERENCE'S OWN existing_algos/OGM_GE.py between
    backward and step; ours uses the gradient-transform port.  Same ported
    init, same data order, SGD(momentum=0.9, wd=1e-4) per BaseModel.py:276."""
    num_classes, batch, epochs, lr, alpha = 10, 32, 2, 0.05, 0.8
    train, _ = _make_data(n_train=256, num_classes=num_classes)

    ref_joint = _load_reference_lenet()
    sys.path.insert(0, REFERENCE)
    try:
        from existing_algos.OGM_GE import ogm_ge as ref_ogm_ge  # type: ignore
    finally:
        sys.path.pop(0)

    torch.manual_seed(11)

    class RefNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.x1_model = ref_joint.LeNet(1, 6, 3)
            self.x2_model = ref_joint.LeNet(1, 6, 3)
            self.classifier_x1 = torch.nn.Linear(48, num_classes)
            self.classifier_x2 = torch.nn.Linear(48, num_classes)
            self.loss_fn = torch.nn.CrossEntropyLoss()

        def forward(self, x1, x2, label):
            l1 = self.classifier_x1(torch.relu(self.x1_model(x1)))
            l2 = self.classifier_x2(torch.relu(self.x2_model(x2)))
            avg = (l1 + l2) / 2
            return l1, l2, avg, self.loss_fn(avg, label)

    net = RefNet()
    opt = torch.optim.SGD(net.parameters(), lr=lr, momentum=0.9,
                          weight_decay=1e-4)
    tx1 = torch.tensor(train.modalities[0].transpose(0, 3, 1, 2))
    tx2 = torch.tensor(train.modalities[1].transpose(0, 3, 1, 2))
    ty = torch.tensor(train.labels.astype(np.int64))
    net.train()
    torch_epoch_losses = []
    for _ in range(epochs):
        losses = []
        for start in range(0, len(ty), batch):
            sl = slice(start, start + batch)
            opt.zero_grad()
            l1, l2, _, loss = net(tx1[sl], tx2[sl], ty[sl])
            loss.backward()
            ref_ogm_ge(net, l1, l2, ty[sl], modulation="OGM", alpha=alpha)
            opt.step()
            losses.append(float(loss))
        torch_epoch_losses.append(float(np.mean(losses)))

    # ---- ours ----
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from multimodal_clinical_tpu.data.loader import Loader
    from multimodal_clinical_tpu.data.sampler import SequentialSampler
    from multimodal_clinical_tpu.engine.metrics import EpochAccumulator
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models import torch_port

    class SmallAVNet(nn.Module):
        num_classes: int

        @nn.compact
        def __call__(self, x1, x2, train=True):
            from multimodal_clinical_tpu.models.common import TorchDense
            from multimodal_clinical_tpu.models.lenet import LeNet

            h1 = nn.relu(LeNet(6, 3, name="x1_model")(x1, train))
            h2 = nn.relu(LeNet(6, 3, name="x2_model")(x2, train))
            l1 = TorchDense(self.num_classes, name="classifier_x1")(h1)
            l2 = TorchDense(self.num_classes, name="classifier_x2")(h2)
            return {"logits": [l1, l2]}

    args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                           learning_rate=lr, num_epochs=epochs,
                           use_scheduler=False, seed=0)
    spec = ModelSpec(module=SmallAVNet(num_classes=num_classes),
                     contract="ogm_ge", grad_mod_type="OGM", ogm_alpha=alpha)
    sample = [jnp.asarray(train.modalities[0][:2]),
              jnp.asarray(train.modalities[1][:2])]
    state = create_train_state(spec, args, jax.random.PRNGKey(0), sample,
                               steps_per_epoch=8)

    torch.manual_seed(11)
    sd = RefNet().state_dict()
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for tower in ("x1_model", "x2_model"):
        p, st = torch_port.port_lenet(sd, num_blocks=4, prefix=f"{tower}.")
        params[tower] = p
        stats[tower] = st
    for head in ("classifier_x1", "classifier_x2"):
        params[head] = torch_port.port_torch_linear(
            sd[f"{head}.weight"], sd[f"{head}.bias"])
    state = state.replace(params=params, batch_stats=stats)

    loader = Loader(train, batch, SequentialSampler(len(train)))
    step = make_train_step(spec)
    ours_epoch_losses = []
    for _ in range(epochs):
        acc = EpochAccumulator()
        for b in loader:
            state, metrics = step(state, b)
            acc.append(metrics)
        ours_epoch_losses.append(acc.summary()["train_loss"])

    for t_loss, o_loss in zip(torch_epoch_losses, ours_epoch_losses):
        assert abs(t_loss - o_loss) < 5e-3, (torch_epoch_losses,
                                             ours_epoch_losses)


def test_jprobas_trajectory_with_ported_init(tmp_path):
    """jprobas (CE over log-mean-softmax, eps=1e-9) trajectory parity with
    ported init + sequential order (cremad/joint_model_proba.py:55-64)."""
    num_classes, batch, epochs, lr = 10, 32, 2, 0.05
    train, _ = _make_data(n_train=256, num_classes=num_classes)

    ref_joint = _load_reference_lenet()
    torch.manual_seed(21)

    class RefNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.x1_model = ref_joint.LeNet(1, 6, 3)
            self.x2_model = ref_joint.LeNet(1, 6, 3)
            self.classifier_x1 = torch.nn.Linear(48, num_classes)
            self.classifier_x2 = torch.nn.Linear(48, num_classes)
            self.loss_fn = torch.nn.CrossEntropyLoss()

        def forward(self, x1, x2, label):
            l1 = self.classifier_x1(torch.relu(self.x1_model(x1)))
            l2 = self.classifier_x2(torch.relu(self.x2_model(x2)))
            p1 = torch.softmax(l1, dim=1)
            p2 = torch.softmax(l2, dim=1)
            avg_logprobs = torch.log((p1 + p2) / 2 + 1e-9)
            return self.loss_fn(avg_logprobs, label)

    net = RefNet()
    opt = torch.optim.SGD(net.parameters(), lr=lr)
    tx1 = torch.tensor(train.modalities[0].transpose(0, 3, 1, 2))
    tx2 = torch.tensor(train.modalities[1].transpose(0, 3, 1, 2))
    ty = torch.tensor(train.labels.astype(np.int64))
    net.train()
    torch_epoch_losses = []
    for _ in range(epochs):
        losses = []
        for start in range(0, len(ty), batch):
            sl = slice(start, start + batch)
            opt.zero_grad()
            loss = net(tx1[sl], tx2[sl], ty[sl])
            loss.backward()
            opt.step()
            losses.append(float(loss))
        torch_epoch_losses.append(float(np.mean(losses)))

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from multimodal_clinical_tpu.data.loader import Loader
    from multimodal_clinical_tpu.data.sampler import SequentialSampler
    from multimodal_clinical_tpu.engine.metrics import EpochAccumulator
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models import torch_port

    class SmallAVNet(nn.Module):
        num_classes: int

        @nn.compact
        def __call__(self, x1, x2, train=True):
            from multimodal_clinical_tpu.models.common import TorchDense
            from multimodal_clinical_tpu.models.lenet import LeNet

            h1 = nn.relu(LeNet(6, 3, name="x1_model")(x1, train))
            h2 = nn.relu(LeNet(6, 3, name="x2_model")(x2, train))
            l1 = TorchDense(self.num_classes, name="classifier_x1")(h1)
            l2 = TorchDense(self.num_classes, name="classifier_x2")(h2)
            return {"logits": [l1, l2]}

    args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                           learning_rate=lr, num_epochs=epochs,
                           use_scheduler=False, seed=0)
    spec = ModelSpec(module=SmallAVNet(num_classes=num_classes),
                     contract="jprobas")
    sample = [jnp.asarray(train.modalities[0][:2]),
              jnp.asarray(train.modalities[1][:2])]
    state = create_train_state(spec, args, jax.random.PRNGKey(0), sample,
                               steps_per_epoch=8, momentum=0.0,
                               weight_decay=0.0)
    torch.manual_seed(21)
    sd = RefNet().state_dict()
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for tower in ("x1_model", "x2_model"):
        p, st = torch_port.port_lenet(sd, num_blocks=4, prefix=f"{tower}.")
        params[tower] = p
        stats[tower] = st
    for head in ("classifier_x1", "classifier_x2"):
        params[head] = torch_port.port_torch_linear(
            sd[f"{head}.weight"], sd[f"{head}.bias"])
    state = state.replace(params=params, batch_stats=stats)

    loader = Loader(train, batch, SequentialSampler(len(train)))
    step = make_train_step(spec)
    ours_epoch_losses = []
    for _ in range(epochs):
        acc = EpochAccumulator()
        for b in loader:
            state, metrics = step(state, b)
            acc.append(metrics)
        ours_epoch_losses.append(acc.summary()["train_loss"])

    for t_loss, o_loss in zip(torch_epoch_losses, ours_epoch_losses):
        assert abs(t_loss - o_loss) < 5e-3, (torch_epoch_losses,
                                             ours_epoch_losses)


def test_ensemble_trajectory_with_ported_init(tmp_path):
    """Ensemble contract (sum of per-modality CE, x3.0 scale like cremad)
    trajectory parity with ported init + sequential order."""
    num_classes, batch, epochs, lr, scale = 10, 32, 2, 0.05, 3.0
    train, _ = _make_data(n_train=256, num_classes=num_classes)

    ref_joint = _load_reference_lenet()
    torch.manual_seed(31)

    class RefNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.x1_model = ref_joint.LeNet(1, 6, 3)
            self.x2_model = ref_joint.LeNet(1, 6, 3)
            self.classifier_x1 = torch.nn.Linear(48, num_classes)
            self.classifier_x2 = torch.nn.Linear(48, num_classes)
            self.loss_fn = torch.nn.CrossEntropyLoss()

        def forward(self, x1, x2, label):
            l1 = self.classifier_x1(torch.relu(self.x1_model(x1)))
            l2 = self.classifier_x2(torch.relu(self.x2_model(x2)))
            # EnsembleBaseModel train loss = x1_loss + x2_loss
            # (BaseModel.py:353); cremad scales each CE x3.0
            return self.loss_fn(l1, label) * scale + \
                self.loss_fn(l2, label) * scale

    net = RefNet()
    opt = torch.optim.SGD(net.parameters(), lr=lr, momentum=0.9,
                          weight_decay=1e-4)
    tx1 = torch.tensor(train.modalities[0].transpose(0, 3, 1, 2))
    tx2 = torch.tensor(train.modalities[1].transpose(0, 3, 1, 2))
    ty = torch.tensor(train.labels.astype(np.int64))
    net.train()
    torch_epoch_losses = []
    for _ in range(epochs):
        losses = []
        for start in range(0, len(ty), batch):
            sl = slice(start, start + batch)
            opt.zero_grad()
            loss = net(tx1[sl], tx2[sl], ty[sl])
            loss.backward()
            opt.step()
            losses.append(float(loss))
        torch_epoch_losses.append(float(np.mean(losses)))

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from multimodal_clinical_tpu.data.loader import Loader
    from multimodal_clinical_tpu.data.sampler import SequentialSampler
    from multimodal_clinical_tpu.engine.metrics import EpochAccumulator
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models import torch_port

    class SmallAVNet(nn.Module):
        num_classes: int

        @nn.compact
        def __call__(self, x1, x2, train=True):
            from multimodal_clinical_tpu.models.common import TorchDense
            from multimodal_clinical_tpu.models.lenet import LeNet

            h1 = nn.relu(LeNet(6, 3, name="x1_model")(x1, train))
            h2 = nn.relu(LeNet(6, 3, name="x2_model")(x2, train))
            l1 = TorchDense(self.num_classes, name="classifier_x1")(h1)
            l2 = TorchDense(self.num_classes, name="classifier_x2")(h2)
            return {"logits": [l1, l2]}

    args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                           learning_rate=lr, num_epochs=epochs,
                           use_scheduler=False, seed=0)
    spec = ModelSpec(module=SmallAVNet(num_classes=num_classes),
                     contract="ensemble", unimodal_loss_scale=scale)
    sample = [jnp.asarray(train.modalities[0][:2]),
              jnp.asarray(train.modalities[1][:2])]
    state = create_train_state(spec, args, jax.random.PRNGKey(0), sample,
                               steps_per_epoch=8)
    torch.manual_seed(31)
    sd = RefNet().state_dict()
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for tower in ("x1_model", "x2_model"):
        p, st = torch_port.port_lenet(sd, num_blocks=4, prefix=f"{tower}.")
        params[tower] = p
        stats[tower] = st
    for head in ("classifier_x1", "classifier_x2"):
        params[head] = torch_port.port_torch_linear(
            sd[f"{head}.weight"], sd[f"{head}.bias"])
    state = state.replace(params=params, batch_stats=stats)

    loader = Loader(train, batch, SequentialSampler(len(train)))
    step = make_train_step(spec)
    ours_epoch_losses = []
    for _ in range(epochs):
        acc = EpochAccumulator()
        for b in loader:
            state, metrics = step(state, b)
            acc.append(metrics)
        ours_epoch_losses.append(acc.summary()["train_loss"])

    for t_loss, o_loss in zip(torch_epoch_losses, ours_epoch_losses):
        assert abs(t_loss - o_loss) < 2e-2, (torch_epoch_losses,
                                             ours_epoch_losses)


def test_legacy_ensemble_mean_trajectory_with_ported_init(tmp_path):
    """Legacy ensemble contract trajectory parity: the avmnist/ave/vggsound
    ensemble dirs train on the MEAN of the per-modality CE losses
    ((x1_loss + x2_loss) / 2 — avmnist/ensemble_model.py:195,
    ave/ensemble_model.py:115, vggsound/ensemble_model.py:114), unlike the
    new-style EnsembleBaseModel's sum (utils/BaseModel.py:353).  Steps the
    reference's own LeNet with the legacy mean semantics vs our ensemble
    contract with ``ensemble_train_mean=True`` from ported inits."""
    num_classes, batch, epochs, lr = 10, 32, 2, 0.05
    train, _ = _make_data(n_train=256, num_classes=num_classes)

    ref_joint = _load_reference_lenet()
    torch.manual_seed(47)

    class RefNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.x1_model = ref_joint.LeNet(1, 6, 3)
            self.x2_model = ref_joint.LeNet(1, 6, 3)
            self.classifier_x1 = torch.nn.Linear(48, num_classes)
            self.classifier_x2 = torch.nn.Linear(48, num_classes)
            self.loss_fn = torch.nn.CrossEntropyLoss()

        def forward(self, x1, x2, label):
            l1 = self.classifier_x1(torch.relu(self.x1_model(x1)))
            l2 = self.classifier_x2(torch.relu(self.x2_model(x2)))
            # legacy train loss: avg_loss = (x1_loss + x2_loss) / 2
            # (avmnist/ensemble_model.py:195)
            return (self.loss_fn(l1, label) + self.loss_fn(l2, label)) / 2

    net = RefNet()
    opt = torch.optim.SGD(net.parameters(), lr=lr, momentum=0.9,
                          weight_decay=1e-4)
    tx1 = torch.tensor(train.modalities[0].transpose(0, 3, 1, 2))
    tx2 = torch.tensor(train.modalities[1].transpose(0, 3, 1, 2))
    ty = torch.tensor(train.labels.astype(np.int64))
    net.train()
    torch_epoch_losses = []
    for _ in range(epochs):
        losses = []
        for start in range(0, len(ty), batch):
            sl = slice(start, start + batch)
            opt.zero_grad()
            loss = net(tx1[sl], tx2[sl], ty[sl])
            loss.backward()
            opt.step()
            losses.append(float(loss))
        torch_epoch_losses.append(float(np.mean(losses)))

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from multimodal_clinical_tpu.data.loader import Loader
    from multimodal_clinical_tpu.data.sampler import SequentialSampler
    from multimodal_clinical_tpu.engine.metrics import EpochAccumulator
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models import torch_port

    class SmallAVNet(nn.Module):
        num_classes: int

        @nn.compact
        def __call__(self, x1, x2, train=True):
            from multimodal_clinical_tpu.models.common import TorchDense
            from multimodal_clinical_tpu.models.lenet import LeNet

            h1 = nn.relu(LeNet(6, 3, name="x1_model")(x1, train))
            h2 = nn.relu(LeNet(6, 3, name="x2_model")(x2, train))
            l1 = TorchDense(self.num_classes, name="classifier_x1")(h1)
            l2 = TorchDense(self.num_classes, name="classifier_x2")(h2)
            return {"logits": [l1, l2]}

    args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                           learning_rate=lr, num_epochs=epochs,
                           use_scheduler=False, seed=0)
    spec = ModelSpec(module=SmallAVNet(num_classes=num_classes),
                     contract="ensemble", ensemble_train_mean=True)
    sample = [jnp.asarray(train.modalities[0][:2]),
              jnp.asarray(train.modalities[1][:2])]
    state = create_train_state(spec, args, jax.random.PRNGKey(0), sample,
                               steps_per_epoch=8)
    torch.manual_seed(47)
    sd = RefNet().state_dict()
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for tower in ("x1_model", "x2_model"):
        p, st = torch_port.port_lenet(sd, num_blocks=4, prefix=f"{tower}.")
        params[tower] = p
        stats[tower] = st
    for head in ("classifier_x1", "classifier_x2"):
        params[head] = torch_port.port_torch_linear(
            sd[f"{head}.weight"], sd[f"{head}.bias"])
    state = state.replace(params=params, batch_stats=stats)

    loader = Loader(train, batch, SequentialSampler(len(train)))
    step = make_train_step(spec)
    ours_epoch_losses = []
    for _ in range(epochs):
        acc = EpochAccumulator()
        for b in loader:
            state, metrics = step(state, b)
            acc.append(metrics)
        ours_epoch_losses.append(acc.summary()["train_loss"])

    for t_loss, o_loss in zip(torch_epoch_losses, ours_epoch_losses):
        assert abs(t_loss - o_loss) < 2e-2, (torch_epoch_losses,
                                             ours_epoch_losses)


def test_qmf_trajectory_with_ported_init(tmp_path):
    """QMF trajectory parity vs an independent torch implementation of the
    INTENDED QMF semantics (the reference's existing_algos/QMF.py body is
    broken — README 'divergences'): energy-confidence dynamic fusion
    (QMF.py:109-117), per-sample History EMA of the batch-mean unimodal CE
    (cremad/joint_model_qmf.py:62-65), and the per-modality margin-ranking
    regularizer.  Same ported init, same sequential data order,
    SGD(momentum=0.9, wd=1e-4) — per-epoch losses AND the final history
    tables must agree."""
    num_classes, batch, epochs, lr = 10, 32, 2, 0.05
    n_train = 256
    train, _ = _make_data(n_train=n_train, num_classes=num_classes)

    ref_joint = _load_reference_lenet()
    torch.manual_seed(13)

    class RefNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.x1_model = ref_joint.LeNet(1, 6, 3)
            self.x2_model = ref_joint.LeNet(1, 6, 3)
            self.classifier_x1 = torch.nn.Linear(48, num_classes)
            self.classifier_x2 = torch.nn.Linear(48, num_classes)

        def forward(self, x1, x2):
            l1 = self.classifier_x1(torch.relu(self.x1_model(x1)))
            l2 = self.classifier_x2(torch.relu(self.x2_model(x2)))
            return l1, l2

    def t_normalize(table, values):
        t_min, t_max = table.min(), table.max()
        return (values - t_min) / (t_max - t_min + 1e-12)

    net = RefNet()
    opt = torch.optim.SGD(net.parameters(), lr=lr, momentum=0.9,
                          weight_decay=1e-4)
    corr_tab = torch.zeros(2, n_train)
    conf_tab = torch.zeros(2, n_train)
    ce = torch.nn.CrossEntropyLoss()
    tx1 = torch.tensor(train.modalities[0].transpose(0, 3, 1, 2))
    tx2 = torch.tensor(train.modalities[1].transpose(0, 3, 1, 2))
    ty = torch.tensor(train.labels.astype(np.int64))
    net.train()
    torch_epoch_losses = []
    for _ in range(epochs):
        losses = []
        for start in range(0, len(ty), batch):
            sl = slice(start, start + batch)
            idx = torch.arange(start, start + batch)
            opt.zero_grad()
            l1, l2 = net(tx1[sl], tx2[sl])
            logits = [l1, l2]
            confs = [torch.logsumexp(l, dim=1) / 10.0 for l in logits]
            fused = sum(l * c.detach().unsqueeze(1)
                        for l, c in zip(logits, confs))
            loss_joint = ce(fused, ty[sl])
            loss_uni = [ce(l, ty[sl]) for l in logits]
            # history EMA: batch-mean unimodal CE broadcast to the batch rows
            with torch.no_grad():
                for m in range(2):
                    corr_tab[m, idx] = (0.9 * corr_tab[m, idx]
                                        + 0.1 * loss_uni[m].detach())
                    conf_tab[m, idx] = confs[m].detach()
            partner = torch.roll(torch.arange(batch), -1)
            reg = 0.0
            for m in range(2):
                with torch.no_grad():
                    t1 = t_normalize(corr_tab[m], corr_tab[m][idx])
                    t2 = t_normalize(corr_tab[m], corr_tab[m][idx[partner]])
                    tgt = torch.sign(t1 - t2)
                    mgn = torch.abs(t1 - t2)
                tgt_nonzero = torch.where(tgt == 0, torch.ones_like(tgt), tgt)
                input2 = confs[m][partner] + mgn / tgt_nonzero
                reg = reg + torch.relu(tgt * (confs[m] - input2)).mean()
            loss = loss_joint + sum(loss_uni) + reg
            loss.backward()
            opt.step()
            losses.append(float(loss))
        torch_epoch_losses.append(float(np.mean(losses)))

    # ---- our engine, initialized from the SAME torch weights ----
    import jax
    import jax.numpy as jnp

    from multimodal_clinical_tpu.data.loader import Loader
    from multimodal_clinical_tpu.data.sampler import SequentialSampler
    from multimodal_clinical_tpu.engine.metrics import EpochAccumulator
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models import torch_port
    from flax import linen as nn

    class SmallAVNet(nn.Module):
        num_classes: int

        @nn.compact
        def __call__(self, x1, x2, train=True):
            from multimodal_clinical_tpu.models.common import TorchDense
            from multimodal_clinical_tpu.models.lenet import LeNet

            h1 = nn.relu(LeNet(6, 3, name="x1_model")(x1, train))
            h2 = nn.relu(LeNet(6, 3, name="x2_model")(x2, train))
            l1 = TorchDense(self.num_classes, name="classifier_x1")(h1)
            l2 = TorchDense(self.num_classes, name="classifier_x2")(h2)
            return {"logits": [l1, l2]}

    args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                           learning_rate=lr, num_epochs=epochs,
                           use_scheduler=False, seed=0)
    spec = ModelSpec(module=SmallAVNet(num_classes=num_classes),
                     contract="qmf", n_train_samples=n_train)
    sample = [jnp.asarray(train.modalities[0][:2]),
              jnp.asarray(train.modalities[1][:2])]
    state = create_train_state(spec, args, jax.random.PRNGKey(0), sample,
                               steps_per_epoch=8, momentum=0.9,
                               weight_decay=1e-4)

    torch.manual_seed(13)
    fresh = RefNet()
    sd = fresh.state_dict()
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for tower in ("x1_model", "x2_model"):
        p, st = torch_port.port_lenet(sd, num_blocks=4, prefix=f"{tower}.")
        params[tower] = p
        stats[tower] = st
    for head in ("classifier_x1", "classifier_x2"):
        params[head] = torch_port.port_torch_linear(
            sd[f"{head}.weight"], sd[f"{head}.bias"])
    state = state.replace(params=params, batch_stats=stats)

    loader = Loader(train, batch, SequentialSampler(len(train)))
    step = make_train_step(spec)
    ours_epoch_losses = []
    for _ in range(epochs):
        acc = EpochAccumulator()
        for b in loader:
            state, metrics = step(state, b)
            acc.append(metrics)
        ours_epoch_losses.append(acc.summary()["train_loss"])

    for t_loss, o_loss in zip(torch_epoch_losses, ours_epoch_losses):
        assert abs(t_loss - o_loss) < 5e-3, (torch_epoch_losses,
                                             ours_epoch_losses)
    # final history tables must match the torch-side tables
    np.testing.assert_allclose(np.asarray(state.qmf_correctness),
                               corr_tab.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.qmf_confidence),
                               conf_tab.numpy(), rtol=2e-3, atol=2e-3)


def test_mustard_three_modality_trajectory_with_ported_init(tmp_path):
    """3-modality jlogits trajectory parity UNDER ADAM: the reference's own
    MUsTARD LstmClassifier towers (mustard/joint_model.py:9-43, imported
    read-only) trained with logit-mean fusion (joint_model.py:59-83) and the
    reference's actual optimizer — bare torch.optim.Adam(lr), torch
    defaults, no scheduler (joint_model.py:275-277) — vs our MustardFusionNet
    under the jlogits contract with opt ``optimizer="adam"``, from the same
    ported init and data order.  Pins the x3 engine path, the LSTM
    recurrence, AND the Adam protocol (betas (0.9, 0.999), eps outside the
    sqrt) end to end."""
    num_classes, batch, epochs, lr = 2, 16, 2, 1e-3
    n_train, seq = 128, 10
    from multimodal_clinical_tpu.data.synthetic import make_synthetic_dataset

    shapes = [(seq, 371), (seq, 81), (seq, 300)]
    train = make_synthetic_dataset("mustard", n_train, num_classes, seed=3,
                                   dirs_seed=3, shapes=shapes)

    sys.path.insert(0, os.path.join(REFERENCE, "mustard"))
    for name in ("pytorch_lightning", "torchvision", "torchvision.models"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["pytorch_lightning"].LightningModule = object
    sys.modules.pop("joint_model", None)  # evict another dir's cached module
    try:
        from joint_model import LstmClassifier as RefLstm  # type: ignore
    finally:
        sys.modules.pop("joint_model", None)
        sys.path.pop(0)

    torch.manual_seed(17)

    class RefNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.x1_model = RefLstm(371, num_classes)
            self.x2_model = RefLstm(81, num_classes)
            self.x3_model = RefLstm(300, num_classes)
            self.loss_fn = torch.nn.CrossEntropyLoss()

        def forward(self, x1, x2, x3, label):
            l1, l2, l3 = self.x1_model(x1), self.x2_model(x2), self.x3_model(x3)
            avg = (l1 + l2 + l3) / 3
            return avg, self.loss_fn(avg, label)

    net = RefNet()
    # the reference's exact call: Adam with only lr (joint_model.py:276)
    opt = torch.optim.Adam(net.parameters(), lr=lr)
    tx = [torch.tensor(m) for m in train.modalities]
    ty = torch.tensor(train.labels.astype(np.int64))
    net.train()
    torch_epoch_losses = []
    for _ in range(epochs):
        losses = []
        for start in range(0, len(ty), batch):
            sl = slice(start, start + batch)
            opt.zero_grad()
            _, loss = net(tx[0][sl], tx[1][sl], tx[2][sl], ty[sl])
            loss.backward()
            opt.step()
            losses.append(float(loss))
        torch_epoch_losses.append(float(np.mean(losses)))

    # ---- our engine from the SAME ported weights ----
    import jax
    import jax.numpy as jnp

    from multimodal_clinical_tpu.data.loader import Loader
    from multimodal_clinical_tpu.data.sampler import SequentialSampler
    from multimodal_clinical_tpu.engine.metrics import EpochAccumulator
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models import torch_port
    from multimodal_clinical_tpu.models.zoo import MustardFusionNet

    args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                           learning_rate=lr, num_epochs=epochs,
                           use_scheduler=False, seed=0)
    spec = ModelSpec(module=MustardFusionNet(num_classes=num_classes),
                     num_modality=3)
    sample = [jnp.asarray(m[:2]) for m in train.modalities]
    state = create_train_state(spec, args, jax.random.PRNGKey(0), sample,
                               steps_per_epoch=8, optimizer="adam")

    torch.manual_seed(17)
    sd = RefNet().state_dict()
    params = dict(state.params)
    for tower in ("x1_model", "x2_model", "x3_model"):
        params[tower] = torch_port.port_lstm_classifier(
            sd, prefix=f"{tower}.")
    state = state.replace(params=params)

    loader = Loader(train, batch, SequentialSampler(len(train)))
    step = make_train_step(spec)
    ours_epoch_losses = []
    for _ in range(epochs):
        acc = EpochAccumulator()
        for b in loader:
            state, metrics = step(state, b)
            acc.append(metrics)
        ours_epoch_losses.append(acc.summary()["train_loss"])

    for t_loss, o_loss in zip(torch_epoch_losses, ours_epoch_losses):
        assert abs(t_loss - o_loss) < 5e-3, (torch_epoch_losses,
                                             ours_epoch_losses)


def test_fakenews_embed_fusion_trajectory_with_ported_init():
    """The reference's one RUNNABLE fakenews architecture, trajectory-pinned
    under its actual optimizer: a torch twin assembled from the reference's
    own pieces — the JointTextImageModel fusion math (fakenews/model.py:
    59-74: relu towers -> concat -> relu(fusion) -> relu(fc1) -> fc2) with
    a Linear(emb->feat) text module and the reference's own Bottleneck
    ResNet image tower (cremad/backbone.py, the torchvision geometry
    model.py:238 pulls in; fc replaced by Linear(2048->feat),
    model.py:240-241) — stepped with bare torch.optim.Adam (model.py:230)
    vs FakeNewsEmbedFusionNet under the jlogits/num_modality=1 contract
    from the same ported init and data order.  dropout_p=0 on both sides
    (the only stochastic element; its placement is structural).  Per-epoch
    mean losses must agree to float tolerance."""
    num_classes, batch, epochs, lr = 3, 8, 2, 1e-3
    emb_dim, feat, fuse, hidden = 24, 12, 20, 16
    n_train, img = 48, 32
    from multimodal_clinical_tpu.data.synthetic import make_synthetic_dataset

    shapes = [(emb_dim,), (img, img, 3)]
    train = make_synthetic_dataset("fakenews_embed", n_train, num_classes,
                                   seed=11, dirs_seed=11, shapes=shapes)

    sys.path.insert(0, os.path.join(REFERENCE, "cremad"))
    try:
        import backbone as ref_backbone  # type: ignore
    finally:
        sys.path.pop(0)

    torch.manual_seed(29)

    class RefNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.text_module = torch.nn.Linear(emb_dim, feat)
            self.image_resnet = ref_backbone.ResNet(
                ref_backbone.Bottleneck, [1, 1, 1, 1], "visual")
            self.image_fc = torch.nn.Linear(2048, feat)  # RESNET_OUT_DIM
            self.fusion = torch.nn.Linear(2 * feat, fuse)
            self.fc1 = torch.nn.Linear(fuse, hidden)
            self.fc2 = torch.nn.Linear(hidden, num_classes)
            self.loss_fn = torch.nn.CrossEntropyLoss()

        def forward(self, text, image, label):
            tf = torch.nn.functional.relu(self.text_module(text))
            # visual forward folds (B, C, T, H, W); T=1 is a plain NCHW run
            fmap = self.image_resnet(image[:, :, None])
            imf = torch.nn.functional.relu(
                self.image_fc(fmap.mean(dim=(2, 3))))
            combined = torch.cat([tf, imf], dim=1)
            fused = torch.nn.functional.relu(self.fusion(combined))
            hid = torch.nn.functional.relu(self.fc1(fused))
            logits = self.fc2(hid)
            return logits, self.loss_fn(logits, label)

    net = RefNet()
    # snapshot the INIT before the torch loop mutates it — this is what
    # gets ported to our side
    sd0 = {k: v.detach().clone().numpy() for k, v in net.state_dict().items()}
    resnet_sd0 = {k: v.detach().clone()
                  for k, v in net.image_resnet.state_dict().items()}
    opt = torch.optim.Adam(net.parameters(), lr=lr)  # model.py:230
    t_emb = torch.tensor(train.modalities[0])
    t_img = torch.tensor(train.modalities[1].transpose(0, 3, 1, 2))
    ty = torch.tensor(train.labels.astype(np.int64))
    net.train()
    torch_epoch_losses = []
    for _ in range(epochs):
        losses = []
        for start in range(0, len(ty), batch):
            sl = slice(start, start + batch)
            opt.zero_grad()
            _, loss = net(t_emb[sl], t_img[sl], ty[sl])
            loss.backward()
            opt.step()
            losses.append(float(loss))
        torch_epoch_losses.append(float(np.mean(losses)))

    # ---- our engine from the SAME ported weights ----
    import jax
    import jax.numpy as jnp

    from multimodal_clinical_tpu.data.loader import Loader
    from multimodal_clinical_tpu.data.sampler import SequentialSampler
    from multimodal_clinical_tpu.engine.metrics import EpochAccumulator
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models import torch_port
    from multimodal_clinical_tpu.models.zoo import FakeNewsEmbedFusionNet

    args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                           learning_rate=lr, num_epochs=epochs,
                           use_scheduler=False, seed=0)
    module = FakeNewsEmbedFusionNet(
        num_classes=num_classes, embedding_dim=emb_dim,
        text_feature_dim=feat, image_feature_dim=feat,
        fusion_output_size=fuse, hidden_size=hidden, dropout_p=0.0,
        image_stage_sizes=(1, 1, 1, 1))
    spec = ModelSpec(module=module, contract="jlogits", num_modality=1,
                     num_inputs=2)
    sample = [jnp.asarray(m[:2]) for m in train.modalities]
    state = create_train_state(spec, args, jax.random.PRNGKey(0), sample,
                               steps_per_epoch=6, optimizer="adam")

    enc_params, enc_stats = torch_port.port_bottleneck_encoder(
        resnet_sd0, stage_sizes=(1, 1, 1, 1))
    params = dict(state.params)
    params["image_module"] = enc_params
    for lin in ("text_module", "image_fc", "fusion", "fc1", "fc2"):
        params[lin] = torch_port.port_torch_linear(
            sd0[lin + ".weight"], sd0[lin + ".bias"])
    batch_stats = dict(state.batch_stats)
    batch_stats["image_module"] = enc_stats
    state = state.replace(params=params, batch_stats=batch_stats)

    loader = Loader(train, batch, SequentialSampler(len(train)))
    step = make_train_step(spec)
    ours_epoch_losses = []
    for _ in range(epochs):
        acc = EpochAccumulator()
        for b in loader:
            state, metrics = step(state, b)
            acc.append(metrics)
        ours_epoch_losses.append(acc.summary()["train_loss"])

    # single-forward parity from the ported init is ~3e-8; the trajectory
    # tolerance is f32 program-rounding through 12 Adam steps of a
    # BN-heavy bottleneck tower (measured: 1.1e-3 after epoch 1, 5.4e-3
    # after epoch 2 — two XLA-vs-torch programs, same decomposition
    # rationale as test_scan_dispatch_matches_single_steps)
    for t_loss, o_loss in zip(torch_epoch_losses, ours_epoch_losses):
        assert abs(t_loss - o_loss) < 1.5e-2, (torch_epoch_losses,
                                               ours_epoch_losses)


def _load_reference_mimic(module: str = "joint_model"):
    """Import a reference mimic/*.py model file read-only (its FusionNet
    is plain torch; the Lightning base classes it also defines need only a
    stubbed pytorch_lightning.LightningModule at import time)."""
    import importlib

    sys.path.insert(0, REFERENCE)  # utils.BaseModel / existing_algos
    sys.path.insert(0, os.path.join(REFERENCE, "mimic"))
    sys.modules.setdefault("pytorch_lightning",
                           types.ModuleType("pytorch_lightning"))
    # a fresh subclassable stand-in (bare ``object`` breaks the MRO of
    # ``class JointLogitsBaseModel(pl.LightningModule, ABC)``)
    sys.modules["pytorch_lightning"].LightningModule = type(
        "LightningModule", (), {})
    sys.modules.pop(module, None)  # evict another dir's module
    try:
        ref = importlib.import_module(module)
    finally:
        sys.modules.pop(module, None)
        sys.path.pop(0)
        sys.path.pop(0)
    return ref


def _torch_test_epoch(net, x1, x2, y, batch):
    """The reference's test protocol (utils/BaseModel.py:203-267): per-batch
    fused loss/acc means + full-epoch unimodal offset correction, computed
    here independently in numpy (NOT via our engine's offset_correct) so the
    comparison stays two-sided."""
    net.eval()
    losses, accs, stacks = [], [], []
    with torch.no_grad():
        for s in range(0, len(y), batch):
            sl = slice(s, s + batch)
            l1, l2, avg, loss = net(x1[sl], x2[sl], y[sl])
            losses.append(float(loss))
            accs.append(float((avg.argmax(1) == y[sl]).float().mean()))
            stacks.append(torch.stack([l1, l2], dim=1).numpy())
    logits = np.concatenate(stacks)                      # (N, M, C)
    labels = y.numpy()
    m_out = logits.mean(axis=0)                          # (M, C)
    offset = m_out.mean(axis=0, keepdims=True) - m_out   # BaseModel.py:247-249
    corrected = logits + offset
    out = {"test_avg_loss": float(np.mean(losses)),
           "test_avg_acc": float(np.mean(accs))}
    for i in range(2):
        out[f"test_avg_x{i + 1}_acc"] = float(
            np.mean(corrected[:, i, :].argmax(axis=1) == labels))
        out[f"test_avg_x{i + 1}_acc_uncal"] = float(
            np.mean(logits[:, i, :].argmax(axis=1) == labels))
    return out


def test_mimic_multiseed_convergence_parity(tmp_path):
    """Multi-seed END-POINT accuracy parity on the MIMIC twin — the dataset
    whose published numbers (mimic/mimic_jlogits.csv, 50-seed mean 0.7727)
    are the north-star parity target.  Per seed: the reference's OWN
    FusionNet (mimic/joint_model.py:72-125) trained with the reference's
    protocol (SGD momentum 0.9, wd 1e-4, lr 0.1, no scheduler —
    BaseModel.py:275-285 + mimic.yaml) vs our engine from PORTED inits on
    identical data/order; final test metrics (fused acc + offset-corrected
    unimodal accs, BaseModel.py:244-267) must agree per seed AND in the
    across-seed mean — the same mean comparison mimic/analyze_data.py:4-23
    runs over the 50-seed CSVs."""
    import jax
    import jax.numpy as jnp

    from multimodal_clinical_tpu.data.loader import Loader
    from multimodal_clinical_tpu.data.sampler import SequentialSampler
    from multimodal_clinical_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_clinical_tpu.engine.metrics import eval_epoch_summary
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import (make_eval_step,
                                                      make_train_step)
    from multimodal_clinical_tpu.models import torch_port
    from multimodal_clinical_tpu.models.zoo import MimicFusionNet

    ref_mimic = _load_reference_mimic()
    num_classes, batch, epochs, lr = 6, 32, 4, 0.1  # mimic.yaml protocol
    seeds = [0, 1, 2]
    torch_runs, ours_runs = [], []

    for seed in seeds:
        train = make_synthetic_dataset("mimic", 512, num_classes,
                                       seed=seed, dirs_seed=seed)
        test = make_synthetic_dataset("mimic", 256, num_classes,
                                      seed=seed + 100, dirs_seed=seed)

        # ---- reference torch loop (the reference's own FusionNet) ----
        torch.manual_seed(seed)
        net = ref_mimic.FusionNet(
            mlp_input_dim=5, gru_input_features=12, gru_hidden_dim=32,
            num_layers_gru=1, num_classes=num_classes,
            loss_fn=torch.nn.CrossEntropyLoss())
        opt = torch.optim.SGD(net.parameters(), lr=lr, momentum=0.9,
                              weight_decay=1e-4)
        tx1 = torch.tensor(train.modalities[0])
        tx2 = torch.tensor(train.modalities[1])
        ty = torch.tensor(train.labels.astype(np.int64))
        net.train()
        for _ in range(epochs):
            for s in range(0, len(ty), batch):  # sequential order
                sl = slice(s, s + batch)
                opt.zero_grad()
                _, _, _, loss = net(tx1[sl], tx2[sl], ty[sl])
                loss.backward()
                opt.step()
        torch_runs.append(_torch_test_epoch(
            net, torch.tensor(test.modalities[0]),
            torch.tensor(test.modalities[1]),
            torch.tensor(test.labels.astype(np.int64)), batch))

        # ---- our engine from the SAME initial weights ----
        args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                               learning_rate=lr, num_epochs=epochs,
                               use_scheduler=False, seed=seed)
        spec = ModelSpec(module=MimicFusionNet(num_classes=num_classes))
        sample = [jnp.asarray(train.modalities[0][:2]),
                  jnp.asarray(train.modalities[1][:2])]
        state = create_train_state(spec, args, jax.random.PRNGKey(seed),
                                   sample, steps_per_epoch=16, momentum=0.9,
                                   weight_decay=1e-4)
        torch.manual_seed(seed)
        sd = ref_mimic.FusionNet(
            mlp_input_dim=5, gru_input_features=12, gru_hidden_dim=32,
            num_layers_gru=1, num_classes=num_classes,
            loss_fn=torch.nn.CrossEntropyLoss()).state_dict()

        def lin(name):
            return torch_port.port_torch_linear(sd[name + ".weight"],
                                                sd[name + ".bias"])

        params = dict(state.params)
        params["x1_model"] = {
            f"TorchDense_{i}": lin(f"mlp.fc{i + 1}") for i in range(4)}
        params["x2_model"] = {
            "GRUCell_0": torch_port.port_gru_cell(sd, prefix="gru.gru."),
            "TorchDense_0": lin("gru.fc1"),
            "TorchDense_1": lin("gru.fc2"),
            "TorchDense_2": lin("gru.fc3"),
        }
        state = state.replace(params=params)

        step = make_train_step(spec)
        loader = Loader(train, batch, SequentialSampler(len(train)))
        for _ in range(epochs):
            for b in loader:
                state, _ = step(state, b)
        eval_step = make_eval_step(spec)
        outputs = [eval_step(state, b)
                   for b in Loader(test, batch, SequentialSampler(len(test)))]
        summary = eval_epoch_summary(outputs, "test")
        ours_runs.append({k[len("test_epoch/"):]: v
                          for k, v in summary.items()})

    keys = ["test_avg_acc", "test_avg_x1_acc", "test_avg_x2_acc",
            "test_avg_x1_acc_uncal", "test_avg_x2_acc_uncal"]
    for t_run, o_run in zip(torch_runs, ours_runs):
        assert abs(t_run["test_avg_loss"] - o_run["test_avg_loss"]) < 1e-2, (
            t_run, o_run)
        for k in keys:
            assert abs(t_run[k] - o_run[k]) < 0.02, (k, t_run, o_run)
    # the analyze_data.py-style across-seed mean comparison
    for k in keys:
        t_mean = float(np.mean([r[k] for r in torch_runs]))
        o_mean = float(np.mean([r[k] for r in ours_runs]))
        assert abs(t_mean - o_mean) < 0.015, (k, t_mean, o_mean)
    # the planted signal is learned (the comparison is not 1/6-vs-1/6)
    assert all(r["test_avg_acc"] > 0.4 for r in torch_runs), torch_runs


def test_mimic_ensemble_multiseed_convergence_parity(tmp_path):
    """Ensemble twin of the jlogits multi-seed end-point parity — the other
    published target (mimic/mimic_ensemble.csv, 50-seed mean 0.7614).  The
    torch loop steps the reference's OWN ensemble FusionNet with the
    reference's semantics: TRAIN loss 0.8*x1_loss + 1.5*x2_loss
    (mimic/ensemble_model.py:157,160), but val/test fuse the PLAIN mean
    (x1+x2)/2 with per-batch-mean x1/x2 accuracies and loss
    (x1_loss+x2_loss)/2 (ensemble_model.py:234-239) — pinning that our
    fusion_weights stay train-only at eval."""
    import jax
    import jax.numpy as jnp

    from multimodal_clinical_tpu.data.loader import Loader
    from multimodal_clinical_tpu.data.sampler import SequentialSampler
    from multimodal_clinical_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_clinical_tpu.engine.metrics import eval_epoch_summary
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import (make_eval_step,
                                                      make_train_step)
    from multimodal_clinical_tpu.models import torch_port
    from multimodal_clinical_tpu.models.zoo import MimicFusionNet

    ref_ens = _load_reference_mimic("ensemble_model")
    num_classes, batch, epochs, lr = 6, 32, 4, 0.1  # mimic.yaml protocol
    w1, w2 = 0.8, 1.5  # mimic/ensemble_model.py:127-128
    seeds = [0, 1, 2]
    torch_runs, ours_runs = [], []

    for seed in seeds:
        train = make_synthetic_dataset("mimic", 512, num_classes,
                                       seed=seed, dirs_seed=seed)
        test = make_synthetic_dataset("mimic", 256, num_classes,
                                      seed=seed + 100, dirs_seed=seed)

        # ---- reference torch loop (the reference's own FusionNet) ----
        torch.manual_seed(seed)
        net = ref_ens.FusionNet(
            mlp_input_dim=5, gru_input_features=12, gru_hidden_dim=32,
            num_layers_gru=1, num_classes=num_classes,
            loss_fn=torch.nn.CrossEntropyLoss())
        opt = torch.optim.SGD(net.parameters(), lr=lr, momentum=0.9,
                              weight_decay=1e-4)
        tx1 = torch.tensor(train.modalities[0])
        tx2 = torch.tensor(train.modalities[1])
        ty = torch.tensor(train.labels.astype(np.int64))
        net.train()
        for _ in range(epochs):
            for s in range(0, len(ty), batch):  # sequential order
                sl = slice(s, s + batch)
                opt.zero_grad()
                _, _, x1_loss, x2_loss = net(tx1[sl], tx2[sl], ty[sl])
                (w1 * x1_loss + w2 * x2_loss).backward()
                opt.step()
        # reference test protocol: per-batch means, plain-mean fusion
        net.eval()
        ex1 = torch.tensor(test.modalities[0])
        ex2 = torch.tensor(test.modalities[1])
        ey = torch.tensor(test.labels.astype(np.int64))
        losses, accs, x1_accs, x2_accs = [], [], [], []
        with torch.no_grad():
            for s in range(0, len(ey), batch):
                sl = slice(s, s + batch)
                l1, l2, x1_loss, x2_loss = net(ex1[sl], ex2[sl], ey[sl])
                losses.append(float((x1_loss + x2_loss) / 2))
                avg = (l1 + l2) / 2
                accs.append(float((avg.argmax(1) == ey[sl]).float().mean()))
                x1_accs.append(float((l1.argmax(1) == ey[sl]).float().mean()))
                x2_accs.append(float((l2.argmax(1) == ey[sl]).float().mean()))
        torch_runs.append({
            "test_avg_loss": float(np.mean(losses)),
            "test_avg_acc": float(np.mean(accs)),
            "test_avg_x1_acc": float(np.mean(x1_accs)),
            "test_avg_x2_acc": float(np.mean(x2_accs)),
        })

        # ---- our engine from the SAME initial weights ----
        args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                               learning_rate=lr, num_epochs=epochs,
                               use_scheduler=False, seed=seed)
        spec = ModelSpec(module=MimicFusionNet(num_classes=num_classes),
                         contract="ensemble", fusion_weights=(w1, w2))
        sample = [jnp.asarray(train.modalities[0][:2]),
                  jnp.asarray(train.modalities[1][:2])]
        state = create_train_state(spec, args, jax.random.PRNGKey(seed),
                                   sample, steps_per_epoch=16, momentum=0.9,
                                   weight_decay=1e-4)
        torch.manual_seed(seed)
        sd = ref_ens.FusionNet(
            mlp_input_dim=5, gru_input_features=12, gru_hidden_dim=32,
            num_layers_gru=1, num_classes=num_classes,
            loss_fn=torch.nn.CrossEntropyLoss()).state_dict()

        def lin(name):
            return torch_port.port_torch_linear(sd[name + ".weight"],
                                                sd[name + ".bias"])

        params = dict(state.params)
        params["x1_model"] = {
            f"TorchDense_{i}": lin(f"mlp.fc{i + 1}") for i in range(4)}
        params["x2_model"] = {
            "GRUCell_0": torch_port.port_gru_cell(sd, prefix="gru.gru."),
            "TorchDense_0": lin("gru.fc1"),
            "TorchDense_1": lin("gru.fc2"),
            "TorchDense_2": lin("gru.fc3"),
        }
        state = state.replace(params=params)

        step = make_train_step(spec)
        loader = Loader(train, batch, SequentialSampler(len(train)))
        for _ in range(epochs):
            for b in loader:
                state, _ = step(state, b)
        eval_step = make_eval_step(spec)
        outputs = [eval_step(state, b)
                   for b in Loader(test, batch, SequentialSampler(len(test)))]
        summary = eval_epoch_summary(outputs, "test")
        ours_runs.append({k[len("test_epoch/"):]: v
                          for k, v in summary.items()})

    keys = ["test_avg_acc", "test_avg_x1_acc", "test_avg_x2_acc"]
    for t_run, o_run in zip(torch_runs, ours_runs):
        assert abs(t_run["test_avg_loss"] - o_run["test_avg_loss"]) < 1e-2, (
            t_run, o_run)
        for k in keys:
            assert abs(t_run[k] - o_run[k]) < 0.02, (k, t_run, o_run)
    for k in keys:
        t_mean = float(np.mean([r[k] for r in torch_runs]))
        o_mean = float(np.mean([r[k] for r in ours_runs]))
        assert abs(t_mean - o_mean) < 0.015, (k, t_mean, o_mean)
    assert all(r["test_avg_acc"] > 0.4 for r in torch_runs), torch_runs
