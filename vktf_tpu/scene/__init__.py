from vktf_tpu.scene.flatten import RenderScene, SceneMeta, flatten_assets

__all__ = ["RenderScene", "SceneMeta", "flatten_assets", "Scene"]


def __getattr__(name):
    if name == "Scene":
        from vktf_tpu.scene.scene import Scene

        return Scene
    raise AttributeError(f"module 'vktf_tpu.scene' has no attribute {name!r}")
