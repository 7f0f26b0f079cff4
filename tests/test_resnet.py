"""ResNet-50 trunk: shape test + numerical parity vs torchvision (random
weights imported torch->flax, eval mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from med_tpu.models.resnet import (
    ResNet50,
    ResNetClassifier,
    import_torchvision_resnet50,
)


@pytest.mark.slow
def test_resnet_classifier_shapes(rng):
    # tiny stage config to keep CPU time low; same code path as (3,4,6,3)
    model = ResNetClassifier(stage_sizes=(1, 1, 1, 1), width=8)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 1)
    feats = model.apply(variables, x, train=False, method="features")
    assert feats.shape == (2, 8 * 8 * 4)
    # train path mutates batch stats
    _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mut


def test_bottleneck_matches_torch_oracle(rng):
    """One stride-2 bottleneck with downsample vs a plain-torch oracle of
    torchvision's v1.5 block (stride on the 3x3 conv)."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as tF

    C_in, width = 16, 8
    conv1 = tnn.Conv2d(C_in, width, 1, bias=False)
    bn1 = tnn.BatchNorm2d(width).eval()
    conv2 = tnn.Conv2d(width, width, 3, stride=2, padding=1, bias=False)
    bn2 = tnn.BatchNorm2d(width).eval()
    conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
    bn3 = tnn.BatchNorm2d(width * 4).eval()
    dconv = tnn.Conv2d(C_in, width * 4, 1, stride=2, bias=False)
    dbn = tnn.BatchNorm2d(width * 4).eval()
    for bn in (bn1, bn2, bn3, dbn):
        bn.running_mean.copy_(torch.tensor(rng.normal(size=bn.running_mean.shape), dtype=torch.float32))
        bn.running_var.copy_(torch.tensor(rng.random(bn.running_var.shape) + 0.5, dtype=torch.float32))

    x = rng.normal(size=(2, 12, 12, C_in)).astype(np.float32)
    with torch.no_grad():
        t = torch.tensor(x).permute(0, 3, 1, 2)
        y = tF.relu(bn1(conv1(t)))
        y = tF.relu(bn2(conv2(y)))
        y = bn3(conv3(y))
        want = tF.relu(y + dbn(dconv(t))).permute(0, 2, 3, 1).numpy()

    from med_tpu.models.resnet import Bottleneck

    m = Bottleneck(width, stride=2, downsample=True)
    variables = m.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)

    def pc(c):
        return {"kernel": c.weight.detach().numpy().transpose(2, 3, 1, 0)}

    def pb(bn):
        return (
            {"scale": bn.weight.detach().numpy(), "bias": bn.bias.detach().numpy()},
            {"mean": bn.running_mean.numpy(), "var": bn.running_var.numpy()},
        )

    params = {"conv1": pc(conv1), "conv2": pc(conv2), "conv3": pc(conv3),
              "down_conv": pc(dconv)}
    stats = {}
    params["bn1"], stats["bn1"] = pb(bn1)
    params["bn2"], stats["bn2"] = pb(bn2)
    params["bn3"], stats["bn3"] = pb(bn3)
    params["down_bn"], stats["down_bn"] = pb(dbn)
    got = m.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                  train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_resnet50_matches_torchvision(rng):
    torchvision = pytest.importorskip("torchvision")
    import torch

    tm = torchvision.models.resnet50(weights=None)
    tm.eval()
    params, stats = import_torchvision_resnet50(tm.state_dict())

    model = ResNet50()
    x = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    got = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    with torch.no_grad():
        t = torch.tensor(x).permute(0, 3, 1, 2)
        y = tm.conv1(t); y = tm.bn1(y); y = tm.relu(y); y = tm.maxpool(y)
        y = tm.layer1(y); y = tm.layer2(y); y = tm.layer3(y); y = tm.layer4(y)
        want = tm.avgpool(y).flatten(1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
