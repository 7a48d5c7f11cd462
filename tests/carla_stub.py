"""A minimal fake `carla` client module, good enough to drive
tools/collect_carla.collect_run headless (both S1 and legacy S2 modes).

Mirrors only the API surface the collector touches: synchronous world
settings, blueprint library, sensor spawn + listen callbacks fed by
world.tick(), actor state getters, weather presets, bounding boxes.
"""
from __future__ import annotations

import sys
import types

import numpy as np


class Location:
    def __init__(self, x=0.0, y=0.0, z=0.0):
        self.x, self.y, self.z = float(x), float(y), float(z)

    def distance(self, other):
        return float(
            np.sqrt(
                (self.x - other.x) ** 2
                + (self.y - other.y) ** 2
                + (self.z - other.z) ** 2
            )
        )


class Rotation:
    def __init__(self, pitch=0.0, yaw=0.0, roll=0.0):
        self.pitch, self.yaw, self.roll = float(pitch), float(yaw), float(roll)


class Transform:
    def __init__(self, location=None, rotation=None):
        self.location = location or Location()
        self.rotation = rotation or Rotation()


class WeatherParameters:
    def __init__(self, **kw):
        self.cloudiness = kw.get("cloudiness", 10.0)
        self.precipitation = kw.get("precipitation", 0.0)
        self.wetness = kw.get("wetness", 0.0)
        self.fog_density = kw.get("fog_density", 0.0)
        self.sun_altitude_angle = kw.get("sun_altitude_angle", 45.0)


WeatherParameters.ClearNoon = WeatherParameters()
WeatherParameters.WetSunset = WeatherParameters(
    precipitation=30.0, wetness=40.0, sun_altitude_angle=5.0
)


class _Blueprint:
    def __init__(self, bp_id):
        self.id = bp_id
        self.attrs = {}

    def set_attribute(self, k, v):
        self.attrs[k] = v


class _BlueprintLibrary:
    def find(self, bp_id):
        return _Blueprint(bp_id)

    def filter(self, pattern):
        if "walker" in pattern:
            return [_Blueprint("walker.pedestrian.0001")]
        return [_Blueprint("vehicle.stub.npc")]


class _FakeImage:
    """BGRA frame delivered to camera listeners (same layout CARLA's RGB
    sensor produces); save_to_disk writes a placeholder file so directory
    layouts can be asserted."""

    def __init__(self, frame, width=8, height=6):
        self.frame = frame
        self.width, self.height = int(width), int(height)
        buf = np.zeros((self.height, self.width, 4), np.uint8)
        buf[..., 0] = 10  # B
        buf[..., 1] = 20  # G
        buf[..., 2] = 30  # R
        buf[..., 3] = 255
        self.raw_data = buf.tobytes()

    def save_to_disk(self, path):
        from pathlib import Path

        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"PNGSTUB")


class VehicleControl:
    def __init__(self, throttle=0.0, steer=0.0, brake=0.0):
        self.throttle, self.steer, self.brake = throttle, steer, brake


class _FakeLidar:
    def __init__(self, frame):
        self.frame = frame
        self.raw_data = np.zeros((8, 4), np.float32).tobytes()


class _BoundingBox:
    def get_world_vertices(self, transform):
        cx, cy, cz = transform.location.x, transform.location.y, transform.location.z
        out = []
        for dx in (-1, 1):
            for dy in (-1, 1):
                for dz in (-1, 1):
                    out.append(Location(cx + dx, cy + dy, cz + dz))
        return out


class _Actor:
    _next_id = [1]

    def __init__(self, world, bp, transform, attach_to=None):
        self.id = _Actor._next_id[0]
        _Actor._next_id[0] += 1
        self.type_id = bp.id
        self.attributes = dict(bp.attrs)
        self._world = world
        self._tf = transform
        self._listener = None
        self.is_alive = True
        self.bounding_box = _BoundingBox()
        self.last_control = None

    # sensors
    def listen(self, cb):
        self._listener = cb
        self._world._sensors.append(self)

    def stop(self):
        self._listener = None

    def apply_control(self, ctrl):
        self.last_control = ctrl

    # vehicles
    def set_autopilot(self, on, tm_port=None):
        pass

    def get_transform(self):
        return self._tf

    def get_location(self):
        return self._tf.location

    def get_velocity(self):
        return Location(5.0, 0.0, 0.0)

    def get_control(self):
        ctrl = types.SimpleNamespace(throttle=0.4, steer=0.02, brake=0.0)
        return ctrl

    def destroy(self):
        self.is_alive = False
        if self in self._world._sensors:
            self._world._sensors.remove(self)


class _ActorList(list):
    def filter(self, pattern):
        key = pattern.strip("*").rstrip(".*").split(".")[0]
        return _ActorList(a for a in self if key in a.type_id)


class _Map:
    name = "StubTown"

    def get_spawn_points(self):
        return [
            Transform(Location(float(i) * 10.0, 0.0, 0.3)) for i in range(12)
        ]


class _Snapshot:
    def __init__(self, t):
        self.timestamp = types.SimpleNamespace(elapsed_seconds=t)


class _World:
    def __init__(self):
        self._settings = types.SimpleNamespace(
            synchronous_mode=False, fixed_delta_seconds=None
        )
        self._actors = _ActorList()
        self._sensors = []
        self._tick = 0
        self._map = _Map()

    def get_settings(self):
        # real CARLA returns a fresh WorldSettings copy on every call
        return types.SimpleNamespace(**vars(self._settings))

    def get_random_location_from_navigation(self):
        # ahead of the ego spawn point and inside the front camera's 90°
        # FOV, so walker bboxes project into frame
        return Location(6.0, 1.0, 0.2)

    def apply_settings(self, s):
        self._settings = s

    def get_blueprint_library(self):
        return _BlueprintLibrary()

    def get_map(self):
        return self._map

    def set_weather(self, w):
        self.weather = w

    def spawn_actor(self, bp, transform, attach_to=None):
        a = _Actor(self, bp, transform, attach_to)
        self._actors.append(a)
        return a

    def tick(self):
        self._tick += 1
        for s in self._sensors:
            if s._listener is None:
                continue
            if "lidar" in s.type_id:
                s._listener(_FakeLidar(self._tick))
            elif "collision" in s.type_id:
                pass  # no collisions in the stub
            else:
                s._listener(_FakeImage(
                    self._tick,
                    width=s.attributes.get("image_size_x", 8),
                    height=s.attributes.get("image_size_y", 6),
                ))
        return self._tick

    def get_snapshot(self):
        return _Snapshot(self._tick * 0.05)

    def get_actors(self):
        return self._actors


class Client:
    def __init__(self, host="127.0.0.1", port=2000):
        self._world = _World()

    def set_timeout(self, t):
        pass

    def get_world(self):
        return self._world


def install():
    """Register this stub as the importable `carla` module."""
    mod = types.ModuleType("carla")
    for name, obj in globals().items():
        if not name.startswith("_"):
            setattr(mod, name, obj)
    mod.Transform = Transform
    mod.Location = Location
    mod.Rotation = Rotation
    mod.WeatherParameters = WeatherParameters
    mod.Client = Client
    sys.modules["carla"] = mod
    return mod
