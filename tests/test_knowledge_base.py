"""Knowledge base: entity lifecycle, relationship inference, exports, schema."""

import json

from gvl_tpu.fusion import (
    EntityCategory,
    EntityState,
    KnowledgeBaseBuilder,
    KnowledgeBaseConfig,
    RelationType,
    create_knowledge_base,
)
from gvl_tpu.fusion.schema import (
    KB_SCHEMA_VERSION,
    get_schema_documentation,
    validate_schema_dict,
)


def make_kb(**kw) -> KnowledgeBaseBuilder:
    return KnowledgeBaseBuilder(KnowledgeBaseConfig(**kw))


class TestEntities:
    def test_register_and_reregister(self):
        kb = make_kb()
        kb.register_entity("e1", "goblin", EntityCategory.ENEMY, timestamp=1.0)
        node = kb.register_entity("e1", "goblin", timestamp=5.0)
        assert node.first_seen == 1.0
        assert node.last_seen == 5.0
        assert len(kb.entities) == 1

    def test_state_history_and_closest_lookup(self):
        kb = make_kb()
        kb.register_entity("e1", "goblin")
        for t in (1.0, 2.0, 5.0):
            kb.update_entity_state("e1", t, position=(t * 10, 0))
        node = kb.get_entity("e1")
        assert node.get_state_at(1.9).timestamp == 2.0
        assert node.get_state_at(0.0).timestamp == 1.0
        assert node.get_state_at(99.0).timestamp == 5.0
        assert node.get_latest_state().timestamp == 5.0

    def test_history_cap(self):
        kb = make_kb(max_history_per_entity=10)
        kb.register_entity("e1", "goblin")
        for t in range(25):
            kb.update_entity_state("e1", float(t))
        assert len(kb.get_entity("e1").state_history) == 10
        assert kb.get_entity("e1").state_history[0].timestamp == 15.0

    def test_attribute_changes(self):
        kb = make_kb()
        kb.register_entity("e1", "boss")
        kb.update_entity_state("e1", 1.0, attributes={"hp": 100})
        kb.update_entity_state("e1", 2.0, attributes={"hp": 100})
        kb.update_entity_state("e1", 3.0, attributes={"hp": 50})
        changes = kb.get_entity("e1").get_attribute_changes("hp")
        assert changes == [(1.0, None, 100), (3.0, 100, 50)]


class TestRelationshipInference:
    def test_near_and_directional(self):
        kb = make_kb(proximity_threshold=50.0, infer_interactions=False)
        kb.register_entity("a", "player",
                           initial_state=EntityState(1.0, position=(0, 0)))
        kb.register_entity("b", "enemy",
                           initial_state=EntityState(1.0, position=(30, 5)))
        edges = kb.infer_relationships_at(1.0)
        types = {e.relation_type for e in edges}
        assert RelationType.NEAR in types
        assert RelationType.LEFT_OF in types  # b is to the right => a LEFT_OF b

    def test_vertical_dominant_axis(self):
        kb = make_kb(infer_interactions=False)
        kb.register_entity("a", "x",
                           initial_state=EntityState(1.0, position=(0, 0)))
        kb.register_entity("b", "y",
                           initial_state=EntityState(1.0, position=(5, 200)))
        types = {e.relation_type for e in kb.infer_relationships_at(1.0)}
        assert RelationType.ABOVE in types  # b below in screen coords => a ABOVE b
        assert RelationType.LEFT_OF not in types

    def test_contains_and_collision(self):
        kb = make_kb(infer_spatial_relations=True, infer_interactions=True)
        kb.register_entity(
            "outer", "arena",
            initial_state=EntityState(1.0, position=(50, 50), bbox=(0, 0, 100, 100)),
        )
        kb.register_entity(
            "inner", "chest",
            initial_state=EntityState(1.0, position=(50, 50), bbox=(40, 40, 60, 60)),
        )
        edges = kb.infer_relationships_at(1.0)
        types = {e.relation_type for e in edges}
        assert RelationType.CONTAINS in types
        # inner fully inside outer: inter=400, union=10000 -> IoU 0.04 < 0.3
        assert RelationType.COLLIDES_WITH not in types
        containing = next(e for e in edges
                          if e.relation_type is RelationType.CONTAINS)
        assert containing.source_id == "outer"

    def test_collision_threshold(self):
        kb = make_kb(infer_spatial_relations=False, infer_interactions=True)
        kb.register_entity(
            "a", "x", initial_state=EntityState(1.0, bbox=(0, 0, 10, 10)))
        kb.register_entity(
            "b", "y", initial_state=EntityState(1.0, bbox=(2, 2, 12, 12)))
        # inter = 8*8=64, union = 100+100-64=136, IoU≈0.47 >= 0.3
        types = {e.relation_type for e in kb.infer_relationships_at(1.0)}
        assert types == {RelationType.COLLIDES_WITH}

    def test_no_edges_without_states(self):
        kb = make_kb()
        kb.register_entity("a", "x")
        kb.register_entity("b", "y")
        assert kb.infer_relationships_at(1.0) == []


class TestTrackingIngest:
    class Bbox:
        def __init__(self, xyxy):
            self._x = xyxy

        def to_xyxy(self):
            return self._x

    class Mask:
        def __init__(self, bbox, conf=0.9):
            self.bbox = bbox
            self.confidence = conf

    class Entity:
        def __init__(self, eid, label, frame_masks):
            self.entity_id = eid
            self.concept_label = label
            self.frame_masks = frame_masks

    def test_update_from_tracking_grows_history(self):
        kb = make_kb()
        ent = self.Entity("e1", "goblin",
                          {0: self.Mask(self.Bbox([10, 10, 30, 30]))})
        kb.update_from_tracking([ent], frame_idx=0, timestamp=1.0)
        node = kb.get_entity("e1")
        assert node is not None
        assert node.state_history[0].position == (20.0, 20.0)
        ent.frame_masks[1] = self.Mask(self.Bbox([20, 20, 40, 40]))
        kb.update_from_tracking([ent], frame_idx=1, timestamp=2.0)
        assert len(node.state_history) == 2

    def test_skips_entities_without_frame_mask(self):
        kb = make_kb()
        ent = self.Entity("e1", "goblin", {})
        kb.update_from_tracking([ent], frame_idx=0, timestamp=1.0)
        assert kb.get_entity("e1") is None


class TestRelationshipLifecycle:
    def test_add_and_end(self):
        kb = make_kb()
        kb.register_entity("a", "player")
        kb.register_entity("b", "boss")
        edge = kb.add_relationship("a", "b", RelationType.ATTACKS, 10.0)
        assert edge.is_active
        assert kb.end_relationship("a", "b", RelationType.ATTACKS, 12.0)
        assert not edge.is_active
        assert edge.duration == 2.0
        assert not kb.end_relationship("a", "b", RelationType.ATTACKS, 13.0)

    def test_relationships_for_entity(self):
        kb = make_kb()
        kb.register_entity("a", "player")
        kb.register_entity("b", "boss")
        kb.add_relationship("a", "b", RelationType.ATTACKS, 10.0)
        kb.add_relationship("b", "a", RelationType.TARGETS, 10.5)
        assert len(kb.get_relationships_for_entity("a")) == 2
        assert len(kb.get_relationships_for_entity("a", as_target=False)) == 1


class TestExports:
    def populated(self) -> KnowledgeBaseBuilder:
        kb = make_kb()
        kb.register_entity("player_001", "player", EntityCategory.PLAYER,
                           timestamp=1.0,
                           initial_state=EntityState(1.0, position=(100, 200)))
        kb.register_entity("boss_001", "dragon", EntityCategory.ENEMY,
                           timestamp=2.0)
        kb.add_relationship("player_001", "boss_001", RelationType.ATTACKS, 83.0)
        return kb

    def test_table(self):
        rows = self.populated().export_as_table()
        assert len(rows) == 2
        row = next(r for r in rows if r["entity_id"] == "player_001")
        assert row["category"] == "player"
        assert row["outgoing_relations"] == 1
        assert row["position"] == (100, 200)

    def test_graph(self):
        graph = self.populated().export_as_graph()
        assert {n["id"] for n in graph["nodes"]} == {"player_001", "boss_001"}
        assert graph["edges"][0]["type"] == "attacks"

    def test_llm_export_format(self):
        text = self.populated().export_for_llm()
        assert "## Entity Knowledge Base" in text
        assert "- **player_001**: player (player) at (100, 200)" in text
        assert "- [83.0s] player_001 attacks boss_001 (ongoing)" in text

    def test_json_schema_export(self, tmp_path):
        kb = self.populated()
        doc = kb.export_to_json(tmp_path / "session.json", video_source="clip.mp4")
        assert doc["schema_version"] == KB_SCHEMA_VERSION
        assert validate_schema_dict(doc) == []
        on_disk = json.loads((tmp_path / "session.json").read_text())
        assert on_disk["video_source"] == "clip.mp4"
        assert len(on_disk["entities"]) == 2

    def test_schema_validation_catches_errors(self):
        doc = {"schema_version": "2.0", "entities": [{"category": "alien"}]}
        errors = validate_schema_dict(doc)
        assert any("schema_version" in e for e in errors)
        assert any("alien" in e for e in errors)
        assert any("relationships" in e for e in errors)

    def test_schema_documentation(self):
        doc = get_schema_documentation()
        assert "player" in doc and "attacks" in doc and KB_SCHEMA_VERSION in doc

    def test_statistics(self):
        stats = self.populated().get_statistics()
        assert stats["total_entities"] == 2
        assert stats["entities_by_category"]["player"] == 1
        assert stats["relationships_by_type"]["attacks"] == 1

    def test_factory(self):
        kb = create_knowledge_base(proximity_threshold=25.0, infer_relations=False)
        assert kb.config.proximity_threshold == 25.0
        assert not kb.config.infer_spatial_relations
