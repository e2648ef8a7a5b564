"""Equipments dimension load vs the reference CSV's real dirtiness
(src/equipamentos.csv): decimal-comma coordinates inside quotes
(FS655JOI row), a fully duplicated device row (FS661JOI), quoted
addresses containing commas, and variable trailing-field counts.
SURVEY §1.4 / VERDICT r1 'What's missing' #5."""

from __future__ import annotations

import pytest

from radares_spark.pipeline.equipments import load_equipments_csv, load_equipments_json

# Mirrors the reference CSV's header and dirtiness classes exactly
# (same column names; rows synthesized, not copied).
DIRTY_CSV = """\
equipment,latitude,longitude,address,bus_lane,bike_lane,parking_lane,number_lanes,Radar nos 2 sentidos da via,endereço alterado,revisados
FS551JOI,-26.26574,-48.80091,"Rua Areia Branca, 681 ",0,0,0,1,x,x,ok
FS655JOI,"-26,2745","-48,85019",Dr. João Colin x Presidente Prudente Moraes,1,0,0,2,-,-,
FS661JOI,-26.36438,-48.82948,"Rua Adolfo da Veiga, 400",0,1,0,1,-,-,
FS661JOI,-26.36438,-48.82948,"Rua Adolfo da Veiga, 400",0,1,0,1,-,-,
FS700JOI,-26.30000,-48.85000,"Rua Teste, 1",0,0,1,3,x,-
"""


@pytest.fixture(scope="module")
def dirty_csv(tmp_path_factory) -> str:
    p = tmp_path_factory.mktemp("equip") / "equipamentos.csv"
    p.write_text(DIRTY_CSV, encoding="utf-8")
    return str(p)


def test_csv_dedup_and_types(spark, dirty_csv):
    df = load_equipments_csv(spark, dirty_csv)
    rows = {r["equipment"]: r for r in df.collect()}

    # duplicate FS661JOI row collapses (reference drop_duplicates,
    # scrape.py:60); 5 data lines -> 4 devices
    assert len(rows) == 4

    # decimal-comma coordinates parsed to floats (FS655JOI row)
    assert rows["FS655JOI"]["latitude"] == pytest.approx(-26.2745)
    assert rows["FS655JOI"]["longitude"] == pytest.approx(-48.85019)
    # plain decimal-point coords still parse
    assert rows["FS551JOI"]["latitude"] == pytest.approx(-26.26574)

    # 0/1 -> booleans (vectorized cast, reference load_equipments.py:80-85)
    assert rows["FS655JOI"]["bus_lane"] is True
    assert rows["FS655JOI"]["bike_lane"] is False
    assert rows["FS700JOI"]["parking_lane"] is True

    # integer lane count; quoted comma-bearing address survives
    assert rows["FS700JOI"]["number_lanes"] == 3
    assert rows["FS661JOI"]["address"] == "Rua Adolfo da Veiga, 400"

    # short row (missing trailing field) -> null, not a crash
    assert rows["FS700JOI"]["revisados"] is None


def test_json_variant_renames_and_bools(spark, tmp_path):
    # the reference JSON loader's pt->en rename + drop + bool cast
    # (load_equipments.py:55-85)
    p = tmp_path / "equip.json"
    p.write_text(
        '{"equipamento":"FS551JOI","endereco":"x","endereco_alterado":"y",'
        '"radar_2_sentidos":"x","ciclofaixa":1,"corredor":0,"estacionamento":1,'
        '"n_faixa_carro_sentido":2,"latitude":"-26,5","longitude":"-48,1"}\n',
        encoding="utf-8",
    )
    df = load_equipments_json(spark, str(p))
    r = df.collect()[0]
    assert r["equipment"] == "FS551JOI"
    assert r["bike_lane"] is True and r["bus_lane"] is False and r["parking_lane"] is True
    assert r["number_lanes"] == 2
    assert r["latitude"] == pytest.approx(-26.5)
    for dropped in ("endereco", "endereco_alterado", "radar_2_sentidos"):
        assert dropped not in df.columns
    assert "date_updated" in df.columns
