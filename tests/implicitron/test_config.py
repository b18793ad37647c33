"""Config system tests (reference tests/implicitron/test_config.py)."""

import dataclasses

from pytorch3d_tpu.implicitron.tools.config import (
    Configurable,
    ReplaceableBase,
    expand_args_fields,
    get_default_args,
    registry,
    remove_unused_components,
    run_auto_creation,
)


class Animal(ReplaceableBase):
    pass


@registry.register
class Dog(Animal):
    bark_volume: float = 1.0


@registry.register
class Cat(Animal):
    lives: int = 9


class Bowl(Configurable):
    liters: float = 0.5


class Home(Configurable):
    pet: Animal
    pet_class_type: str = "Dog"
    bowl: Bowl
    n_rooms: int = 3

    def __post_init__(self):
        run_auto_creation(self)


class TestConfig:
    def test_registry(self):
        assert registry.get(Animal, "Dog") is Dog
        assert registry.get(Animal, "Cat") is Cat
        assert set(c.__name__ for c in registry.get_all(Animal)) == {"Dog", "Cat"}
        try:
            registry.get(Animal, "Fish")
            assert False
        except ValueError:
            pass

    def test_default_args_structure(self):
        cfg = get_default_args(Home)
        assert cfg["n_rooms"] == 3
        assert cfg["pet_class_type"] == "Dog"
        assert cfg["pet_Dog_args"] == {"bark_volume": 1.0}
        assert cfg["pet_Cat_args"] == {"lives": 9}
        assert cfg["bowl_args"] == {"liters": 0.5}

    def test_auto_creation_default(self):
        home = Home(**get_default_args(Home))
        assert isinstance(home.pet, Dog)
        assert home.pet.bark_volume == 1.0
        assert isinstance(home.bowl, Bowl)
        assert home.bowl.liters == 0.5

    def test_auto_creation_override(self):
        cfg = get_default_args(Home)
        cfg["pet_class_type"] = "Cat"
        cfg["pet_Cat_args"]["lives"] = 7
        cfg["bowl_args"]["liters"] = 2.0
        home = Home(**cfg)
        assert isinstance(home.pet, Cat)
        assert home.pet.lives == 7
        assert home.bowl.liters == 2.0

    def test_nested_configurable(self):
        class Street(Configurable):
            home: Home
            name: str = "main"

            def __post_init__(self):
                run_auto_creation(self)

        cfg = get_default_args(Street)
        assert cfg["home_args"]["pet_class_type"] == "Dog"
        cfg["home_args"]["pet_class_type"] = "Cat"
        street = Street(**cfg)
        assert isinstance(street.home.pet, Cat)

    def test_plain_function_defaults(self):
        def fn(a=1, b="x", c=None):
            return a

        assert get_default_args(fn) == {"a": 1, "b": "x", "c": None}

    def test_remove_unused_components(self):
        cfg = get_default_args(Home)
        remove_unused_components(cfg)
        assert "pet_Cat_args" not in cfg
        assert "pet_Dog_args" in cfg

    def test_late_registration(self):
        class Vehicle(ReplaceableBase):
            pass

        @registry.register
        class Bike(Vehicle):
            wheels: int = 2

        class Garage(Configurable):
            vehicle: Vehicle
            vehicle_class_type: str = "Bike"

            def __post_init__(self):
                run_auto_creation(self)

        g = Garage(**get_default_args(Garage))
        assert isinstance(g.vehicle, Bike)


class TestConfigScenarios:
    """Scenario coverage mirroring reference tests/implicitron/test_config.py
    (enum fields :585, pickle :624, optional replaceables :682, inheritance
    :278, get_default_args isolation :916)."""

    def test_enum_fields(self):
        from dataclasses import dataclass
        from enum import Enum

        class Color(Enum):
            RED = "red"
            BLUE = "blue"

        @dataclass
        class WithEnum(Configurable):
            color: Color = Color.RED
            n: int = 3

        args = get_default_args(WithEnum)
        assert args["color"] is Color.RED
        obj = WithEnum(**{**args, "color": Color.BLUE})
        assert obj.color is Color.BLUE

    def test_optional_replaceable_member(self):
        from dataclasses import dataclass
        from typing import Optional

        class Pet2(ReplaceableBase):
            pass

        @registry.register
        @dataclass
        class Cat2(Pet2):
            lives: int = 9

        @dataclass
        class Owner2(Configurable):
            pet: Optional[Pet2] = None
            pet_class_type: Optional[str] = "Cat2"

            def __post_init__(self):
                run_auto_creation(self)

        args = get_default_args(Owner2)
        assert "pet_Cat2_args" in args
        assert isinstance(Owner2(**args).pet, Cat2)
        args["pet_class_type"] = None
        assert Owner2(**args).pet is None

    def test_pickle_default_args(self):
        import pickle

        from pytorch3d_tpu.implicitron.models.renderer.multipass_ea import (
            MultiPassEmissionAbsorptionRenderer,
        )

        args = get_default_args(MultiPassEmissionAbsorptionRenderer)
        assert pickle.loads(pickle.dumps(args)) == args

    def test_inheritance_extends_fields(self):
        from dataclasses import dataclass

        class Base3(ReplaceableBase):
            pass

        @registry.register
        @dataclass
        class Mid3(Base3):
            a: int = 1

        @registry.register
        @dataclass
        class Leaf3(Mid3):
            b: int = 2

        args = get_default_args(Leaf3)
        assert args == {"a": 1, "b": 2}
        assert registry.get(Base3, "Leaf3") is Leaf3

    def test_get_default_args_isolation(self):
        """Mutating a returned default dict must not leak into later calls
        (reference test_get_default_args_readonly)."""
        from dataclasses import dataclass, field
        from typing import List

        @dataclass
        class WithList(Configurable):
            xs: List[int] = field(default_factory=lambda: [1, 2])

        a1 = get_default_args(WithList)
        a1["xs"].append(99)
        a2 = get_default_args(WithList)
        assert a2["xs"] == [1, 2]
