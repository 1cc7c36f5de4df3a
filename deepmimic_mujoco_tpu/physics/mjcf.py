"""MJCF-subset importer → :class:`PhysicsModel`.

Covers the features the reference's models use
(/root/reference/src/mujoco/humanoid_deepmimic/envs/asset/dp_env_v3.xml):
nested ``<body>`` trees with free/hinge joints (joint defaults incl.
armature/damping/limited), sphere/capsule(fromto)/box geoms with explicit
masses, ``<motor>`` actuators with gear and ctrlrange, ``<option>``
timestep/integrator/iterations, plane floor (becomes the implicit ground).

Not a general MuJoCo parser: unsupported elements (sites, cameras, lights,
textures, contact excludes — parent/child pairs are already excluded by
construction) are ignored with a note; unsupported joint types raise."""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Optional

import numpy as np

from deepmimic_mujoco_tpu.physics.inertia import BOX, CAPSULE, SPHERE
from deepmimic_mujoco_tpu.physics.model import ModelBuilder, PhysicsModel

_GEOM_TYPES = {"sphere": SPHERE, "capsule": CAPSULE, "box": BOX}


def _floats(s: Optional[str], default=None):
    if s is None:
        return default
    return tuple(float(x) for x in s.split())


def parse_mjcf(xml_string: str, contact_cap: int = 1 << 30,
               limit_cap: int = 1 << 30) -> PhysicsModel:
    root = ET.fromstring(xml_string)

    # defaults
    joint_default = {"armature": 1.0, "damping": 1.0, "limited": True}
    motor_default = {"ctrlrange": (-0.5, 0.5)}
    default_el = root.find("default")
    if default_el is not None:
        jd = default_el.find("joint")
        if jd is not None:
            joint_default["armature"] = float(jd.get("armature", 1.0))
            joint_default["damping"] = float(jd.get("damping", 1.0))
            joint_default["limited"] = jd.get("limited", "true") == "true"
        md = default_el.find("motor")
        if md is not None:
            motor_default["ctrlrange"] = _floats(md.get("ctrlrange"), (-0.5, 0.5))

    opt = root.find("option")
    dt = float(opt.get("timestep", 0.002)) if opt is not None else 0.002
    integrator = (opt.get("integrator", "Euler") if opt is not None else "Euler").lower()
    integrator = "rk4" if integrator == "rk4" else "euler"
    iterations = int(opt.get("iterations", 50)) if opt is not None else 50

    b = ModelBuilder(dt=dt, integrator=integrator, iterations=iterations,
                     max_contacts=contact_cap, max_limits=limit_cap)

    worldbody = root.find("worldbody")
    if worldbody is None:
        raise ValueError("MJCF has no <worldbody>")

    # plane floor friction
    for geom in worldbody.findall("geom"):
        if geom.get("type") == "plane":
            fr = _floats(geom.get("friction"), (1.0, 0.1, 0.1))
            b.floor_friction = np.asarray(fr)

    geom_counter = [0]
    root_pos = [None]
    root_quat = [None]

    def walk(body_el, parent_name: Optional[str]):
        name = body_el.get("name") or f"body{len(b.bodies)}"
        pos = _floats(body_el.get("pos"), (0, 0, 0))
        quat = _floats(body_el.get("quat"), (1, 0, 0, 0))
        if parent_name is None:
            # free-root: the XML pos/quat are only the initial qpos; FK
            # reads the root pose from qpos directly (body fields metadata)
            root_pos[0] = pos
            root_quat[0] = quat
        b.add_body(name, parent_name, pos=pos, quat=quat)

        for joint in body_el.findall("joint"):
            jtype = joint.get("type", "hinge")
            if jtype == "free":
                if parent_name is not None:
                    raise ValueError("free joint only supported on the root body")
                continue
            if jtype != "hinge":
                raise ValueError(f"unsupported joint type {jtype!r}")
            jpos = _floats(joint.get("pos"), (0, 0, 0))
            if any(abs(v) > 1e-12 for v in jpos):
                # the engine anchors hinges at the body-frame origin
                # (kinematics.fk); a silent origin-anchor import would
                # simulate different dynamics than MuJoCo — fail loud
                raise ValueError(
                    f"hinge {joint.get('name')!r} has a non-origin pos "
                    f"{jpos}; re-author the model with joint anchors at "
                    "body origins (supported engine convention)")
            jname = joint.get("name") or f"{name}_j"
            axis = _floats(joint.get("axis"), (0, 0, 1))
            rng = _floats(joint.get("range"), (0.0, 0.0))
            limited = joint.get("limited", "true" if joint_default["limited"] else "false") == "true"
            b.add_hinge(
                jname, name, axis, range=rng, limited=limited,
                armature=float(joint.get("armature", joint_default["armature"])),
                damping=float(joint.get("damping", joint_default["damping"])),
            )

        for geom in body_el.findall("geom"):
            gtype = geom.get("type", "sphere")
            if gtype not in _GEOM_TYPES:
                continue
            gname = geom.get("name") or f"geom{geom_counter[0]}"
            geom_counter[0] += 1
            mass = float(geom.get("mass", 1.0))
            size = _floats(geom.get("size"), (0.1,))
            size3 = tuple(size) + (0.0,) * (3 - len(size))
            kwargs = dict(size=size3, mass=mass)
            if geom.get("fromto"):
                kwargs["fromto"] = _floats(geom.get("fromto"))
            else:
                kwargs["pos"] = _floats(geom.get("pos"), (0, 0, 0))
                kwargs["quat"] = _floats(geom.get("quat"), (1, 0, 0, 0))
            if geom.get("friction"):
                kwargs["friction"] = _floats(geom.get("friction"))
            b.add_geom(gname, name, _GEOM_TYPES[gtype], **kwargs)

        for child in body_el.findall("body"):
            walk(child, name)

    bodies = worldbody.findall("body")
    if len(bodies) != 1:
        raise ValueError("expected exactly one root <body> under <worldbody>")
    walk(bodies[0], None)

    actuator_el = root.find("actuator")
    if actuator_el is not None:
        for motor in actuator_el.findall("motor"):
            b.add_motor(
                motor.get("joint"), float(motor.get("gear", 1.0)),
                ctrl_range=_floats(motor.get("ctrlrange"),
                                   motor_default["ctrlrange"]),
            )

    model = b.finalize(root_pos=root_pos[0] or (0, 0, 0),
                       root_quat=root_quat[0] or (1, 0, 0, 0))
    # arbitrary imported models may condition the mass matrix worse than the
    # humanoid the Newton–Schulz budget is tuned for — measure and pick the
    # M⁻¹ path once here (engine.calibrate_minv_mode)
    from deepmimic_mujoco_tpu.physics import engine

    return engine.calibrate_minv_mode(model)


def load_mjcf(path: str, **kwargs) -> PhysicsModel:
    with open(path) as f:
        return parse_mjcf(f.read(), **kwargs)
